package graft

import graft.functions.VectorExpressions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, IntegerType, StringType}

/** Session extension wiring for the engine's custom Catalyst surface —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * [[GraftExtensions.install]] on a live session):
  *
  *   - the codegen'd kernel expressions become SQL functions
  *     (`float_vec_dot`, `sorted_intersect_size`, `affine_minhash_sig`,
  *     `shingle_hashes`, `simhash_bits`), so `spark.sql(...)` users get
  *     the same hot paths as the Scala DSL;
  *   - [[VectorizeDotProduct]] — an optimizer rule rewriting the
  *     declarative HOF dot product (`aggregate(zip_with(a, b,
  *     (x,y) -> double(x)*double(y)), 0.0, (acc,v) -> acc+v)`) into the
  *     [[graft.functions.VectorExpressions.FloatVecDot]] kernel. The two
  *     forms are property-tested bit-equal (DedupSpec), and the kernel
  *     keeps the expression inside whole-stage codegen instead of the
  *     interpreted per-element lambda path (~50× on 64-dim vectors).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => VectorizeDotProduct)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** (identifier, info, builder) triples in the shape
    * `SparkSessionExtensions.injectFunction` consumes.
    */
  val functionDescriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "normalize_text expects (text, form)")
        val form = strLit(args(1), "normalize_text form")
        require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
          s"normalize_text form must be NFC|NFD|NFKC|NFKD: $form")
        NormalizeText(args(0), form)
      }),
    (FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))),
    (FunctionIdentifier("affine_minhash_sig"),
      new ExpressionInfo(classOf[AffineMinHashSig].getName,
        "affine_minhash_sig"),
      (args: Seq[Expression]) =>
        AffineMinHashSig(args(0), intLit(args(1), "affine_minhash_sig k"))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashes(args(0), intLit(args(1), "shingle_hashes n"),
          if (args.size > 2) intLit(args(2), "shingle_hashes hexChars") else 8)),
    (FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "simhash_bits"),
      (args: Seq[Expression]) =>
        SimhashBits(args(0), intLit(args(1), "simhash_bits bits"))),
    (FunctionIdentifier("token_pairs"),
      new ExpressionInfo(classOf[TokenPairs].getName, "token_pairs"),
      (args: Seq[Expression]) => TokenPairs(args(0))),
    (FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName,
        "hyperplane_buckets"),
      (args: Seq[Expression]) =>
        HyperplaneBuckets(args(0),
          intLit(args(1), "hyperplane_buckets tables"),
          intLit(args(2), "hyperplane_buckets bits"),
          intLit(args(3), "hyperplane_buckets dims"))),
    (FunctionIdentifier("all_shingles"),
      new ExpressionInfo(classOf[AllShingles].getName, "all_shingles"),
      (args: Seq[Expression]) =>
        AllShingles(args(0), intLit(args(1), "all_shingles n"))),
    (FunctionIdentifier("all_shingle_hashes"),
      new ExpressionInfo(classOf[AllShingleHashes].getName,
        "all_shingle_hashes"),
      (args: Seq[Expression]) =>
        AllShingleHashes(args(0), intLit(args(1), "all_shingle_hashes n"))),
    (FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName,
        "distinct_shingles"),
      (args: Seq[Expression]) => DistinctShingles(args(0),
        intLit(args(1), "distinct_shingles n"),
        sorted = args.size > 2 && (args(2) match {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new IllegalArgumentException(
            s"distinct_shingles sorted must be a boolean literal, got $other")
        }))),
    (FunctionIdentifier("distinct_shingle_count"),
      new ExpressionInfo(classOf[DistinctShingleCount].getName,
        "distinct_shingle_count"),
      (args: Seq[Expression]) => DistinctShingleCount(args(0),
        intLit(args(1), "distinct_shingle_count n"))),
    // iterate('step_sql', 'var', n, init): a MACRO, not a runtime
    // function — the builder unrolls the step n times at resolution,
    // so the analyzed plan holds one ordinary nested expression (the
    // same guarantee as ops.Iterate.unroll; n capped there at 64)
    (FunctionIdentifier("iterate"),
      new ExpressionInfo(graft.ops.Iterate.getClass.getName, "iterate"),
      (args: Seq[Expression]) => {
        require(args.size == 4,
          "iterate expects (step_sql, var_name, n, init)")
        graft.ops.Iterate.unrollExpr(args(3),
          strLit(args(0), "iterate step_sql"),
          strLit(args(1), "iterate var_name"),
          intLit(args(2), "iterate n"))
      }))

  /** Register on an already-built session (new sessions should prefer the
    * `spark.sql.extensions` config). Functions land in the session's
    * registry; the rewrite rule goes through `experimental
    * .extraOptimizations` — both scoped to this session only.
    */
  def install(spark: SparkSession): Unit = {
    functionDescriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(VectorizeDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorizeDotProduct
  }
}

/** Rewrites the declarative float-vector dot product into the codegen'd
  * [[FloatVecDot]] kernel.
  *
  * Fires only where the rewrite is semantics-preserving for EVERY input:
  * both arrays must be `array<float>` with non-null elements (a null
  * element makes the HOF fold null, which the kernel cannot represent),
  * and the result is guarded with `If(size(a) = size(b), kernel, null)`
  * because `zip_with` null-pads ragged pairs — the fold yields NULL there,
  * and so must we. Null top-level inputs: `size(null)` is null, `If`
  * takes the else branch, result null — matching the HOF.
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  private def isDenseFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  /** `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0,
    * (acc,v) -> acc+v)` with an identity finish lambda.
    */
  private object DotShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case agg: ArrayAggregate => unapplyAgg(agg)
      case _ => None
    }

    private def unapplyAgg(agg: ArrayAggregate): Option[(Expression, Expression)] = {
      val zwOpt = agg.argument match {
        case zw: ZipWith if isDenseFloatArray(zw.left.dataType) &&
            isDenseFloatArray(zw.right.dataType) => Some(zw)
        case _ => None
      }
      zwOpt.flatMap { zw =>
        val zeroOk = agg.zero match {
          case Literal(z: Double, DoubleType) => z == 0.0
          case _ => false
        }
        val mulOk = zw.function match {
          case lf: LambdaFunction if lf.arguments.size == 2 =>
            lf.function match {
              case m: Multiply => (m.left, m.right) match {
                case (cx: Cast, cy: Cast) =>
                  cx.dataType == DoubleType && cy.dataType == DoubleType &&
                    cx.child.semanticEquals(lf.arguments.head) &&
                    cy.child.semanticEquals(lf.arguments(1))
                case _ => false
              }
              case _ => false
            }
          case _ => false
        }
        val mergeOk = agg.merge match {
          case lf: LambdaFunction if lf.arguments.size == 2 =>
            lf.function match {
              case a: Add =>
                a.left.semanticEquals(lf.arguments.head) &&
                  a.right.semanticEquals(lf.arguments(1))
              case _ => false
            }
          case _ => false
        }
        val finishOk = agg.finish match {
          case lf: LambdaFunction if lf.arguments.size == 1 =>
            lf.function.semanticEquals(lf.arguments.head)
          case _ => false
        }
        if (zeroOk && mulOk && mergeOk && finishOk) Some((zw.left, zw.right))
        else None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotShape(a, b) =>
        If(EqualTo(Size(a), Size(b)), FloatVecDot(a, b),
          Literal(null, DoubleType))
    }
}
