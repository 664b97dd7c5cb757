package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.graftbridge.Bridge

/** Bounded iteration for user transforms — the loop-shaped slice of the
  * reference's MiniElixir surface (`/root/reference/lib/sequin/
  * functions/minielixir.ex:109-155` compiles real functions with
  * recursion) re-expressed as a construct Catalyst can optimize.
  *
  * `iterate(init, step, var, n)` applies `step` to `init` exactly `n`
  * times by UNROLLING at plan-build time: the loop variable in the
  * parsed step expression is substituted with the accumulated
  * expression tree, n times. The result is one ordinary nested Catalyst
  * expression —
  *   - bounded BY CONSTRUCTION: there is no runtime loop to bound, and
  *     `n` is capped at [[MaxIterations]] at build time (the sandbox's
  *     answer to unbounded recursion — a `while` simply cannot be
  *     written);
  *   - codegen-friendly: the unrolled tree stays inside whole-stage
  *     codegen like any hand-written expression, no UDF boundary;
  *   - sandbox-preserving: `init`/`step` pass the same deny-list walk as
  *     every other user expression ([[graft.config.PipelineSpec]]), and
  *     substitution happens on the PARSED tree, so a loop variable
  *     inside a string literal is never touched.
  *
  * For folds over an array column, Spark's own higher-order
  * `aggregate(arr, init, (acc, x) -> ...)` already serves; `iterate` is
  * the missing fixed-count form (iterated hashing, Newton/LCG steps,
  * bounded normalization passes). The DuckDB-oracle equivalent is a
  * recursive CTE with an `i < n` fence (q80).
  */
object Iterate {

  /** Hard cap on the unroll depth. 64 keeps the deepest expression tree
    * well inside codegen limits (Catalyst splits oversized generated
    * functions anyway) while covering every fixed-point transform the
    * reference's users write inline.
    */
  val MaxIterations = 64

  /** Hard cap on the UNROLLED tree's node count — the depth cap alone
    * does not bound size when the step references the loop variable more
    * than once (k occurrences → k^n growth). 100k nodes is far beyond
    * any legitimate inline transform yet still a sub-second plan build.
    */
  val MaxUnrolledNodes = 100000L

  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Parse-and-unroll. `varName` must be a bare identifier; occurrences
    * of it in `stepSql` (as a simple column reference) are replaced by
    * the accumulated tree. Other attributes still resolve against the
    * input relation, so a step may mix the loop variable with real
    * columns: `iterate("0", "x + l_quantity", "x", 3)` sums the column
    * three times.
    */
  def unroll(initSql: String, stepSql: String, varName: String,
      n: Int): Column =
    Bridge.column(unrollExpr(parse("iterate init", initSql), stepSql,
      varName, n))

  /** Expression-level unroll — shared by [[unroll]] and the SQL-function
    * registration in `GraftExtensions` (`iterate('step', 'var', n,
    * init)`), so the Column API and `spark.sql` can never diverge.
    */
  def unrollExpr(init: Expression, stepSql: String, varName: String,
      n: Int): Expression = {
    require(n >= 0 && n <= MaxIterations,
      s"iterate: iterations must be in [0, $MaxIterations], got $n — " +
        "unbounded or unreasonably deep loops are not expressible")
    require(IdentRe.pattern.matcher(varName).matches(),
      s"iterate: loop variable must be a bare identifier, got '$varName'")
    val step = parse("iterate step", stepSql)
    // A step referencing the loop variable k>1 times grows the unrolled
    // tree ~k^n (e.g. "x + x" at n=40 → 2^40 nodes — an OOM at plan
    // build, long before execution, defeating the depth cap alone). The
    // node count is exact arithmetic: each substitution replaces the k
    // variable leaves with copies of the accumulated tree, so
    //   size(i+1) = size(step) − k + k · size(i).
    // Budget the FINAL tree before building anything.
    val k = step.collect {
      case a: UnresolvedAttribute
          if a.nameParts.lengthCompare(1) == 0 &&
            a.nameParts.head.equalsIgnoreCase(varName) => a
    }.size.toLong
    val stepSize = step.collect { case x => x }.size.toLong
    var estSize = init.collect { case x => x }.size.toLong
    var j = 0
    while (j < n) {
      estSize = stepSize - k + k * estSize
      require(estSize <= MaxUnrolledNodes,
        s"iterate: unrolled expression would exceed $MaxUnrolledNodes " +
          s"nodes (loop variable occurs $k times per step over $n " +
          "iterations) — restructure the step or lower the iteration count")
      j += 1
    }
    var acc = init
    var i = 0
    while (i < n) {
      acc = substitute(step, varName, acc)
      i += 1
    }
    acc
  }

  private def parse(what: String, s: String): Expression =
    try CatalystSqlParser.parseExpression(s)
    catch { case e: Exception =>
      throw new IllegalArgumentException(
        s"$what is not a valid SQL expression: ${e.getMessage}")
    }

  private def substitute(e: Expression, name: String,
      repl: Expression): Expression =
    e.transformUp {
      case a: UnresolvedAttribute
          if a.nameParts.lengthCompare(1) == 0 &&
            a.nameParts.head.equalsIgnoreCase(name) => repl
    }
}
