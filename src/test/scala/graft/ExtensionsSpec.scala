package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SparkSessionExtensions wiring: kernel expressions as SQL functions and
  * the HOF-dot-product → FloatVecDot optimizer rewrite (fires only where
  * semantics-preserving: dense float arrays; ragged pairs still null).
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val ext: SparkSession = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s
  }

  test("kernels are callable from SQL after install") {
    val dot = ext.sql(
      "SELECT float_vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot == 1.5 * 4.0 + 2.0 * 0.5)

    val inter = ext.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .collect().head.getInt(0)
    assert(inter == 2)

    val shingles = ext.sql(
      "SELECT size(shingle_hashes('a b c d', 2)) AS n")
      .collect().head.getInt(0)
    assert(shingles == 3)

    // non-literal k is a plan-time error, not a silent misparse
    val e = intercept[Exception] {
      ext.sql("SELECT affine_minhash_sig(array(1L), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("round-5 kernels are callable from SQL after install") {
    assert(ext.sql("SELECT token_pairs('a b c') AS p")
      .collect().head.getSeq[String](0) == Seq("a b", "b c"))
    assert(ext.sql("SELECT all_shingles('a b c', 2) AS s")
      .collect().head.getSeq[String](0) == Seq("a b", "b c"))
    assert(ext.sql("SELECT size(all_shingle_hashes('a b a b', 2)) AS n")
      .collect().head.getInt(0) == 3) // positional: no dedupe
    assert(ext.sql("SELECT distinct_shingles('b a b a', 2, true) AS s")
      .collect().head.getSeq[String](0) == Seq("a b", "b a")) // sorted distinct
    assert(ext.sql("SELECT distinct_shingles('b a b a', 2) AS s")
      .collect().head.getSeq[String](0) == Seq("b a", "a b")) // first-occurrence
    assert(ext.sql("SELECT distinct_shingle_count('a b a b', 2) AS n")
      .collect().head.getInt(0) == 2)
    val e2 = intercept[Exception] {
      ext.sql("SELECT distinct_shingles('a b', 2, id > 0) FROM range(1)").collect()
    }
    assert(e2.getMessage.contains("boolean literal"))
  }

  test("round-6 kernel: hyperplane_buckets callable from SQL, one bucket per table") {
    val out = ext.sql(
      "SELECT hyperplane_buckets(array(1.0F, -2.0F, 0.5F, 3.0F), 4, 6, 4) AS b")
      .collect().head.getSeq[Long](0)
    assert(out.length == 4)
    assert(out.forall(b => b >= 0 && b < (1L << 6)))
    // deterministic: the same literal embedding yields the same buckets
    val again = ext.sql(
      "SELECT hyperplane_buckets(array(1.0F, -2.0F, 0.5F, 3.0F), 4, 6, 4) AS b")
      .collect().head.getSeq[Long](0)
    assert(out == again)
  }

  test("builder-path registration: withExtensions(GraftExtensions) applies at session build") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session built THROUGH the extensions hook
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-config")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val dot = s2.sql(
        "SELECT float_vec_dot(array(CAST(3.0 AS FLOAT)), array(CAST(7.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(dot == 21.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  // NOTE: inputs below come from `range(...)` rather than local Seqs —
  // ConvertToLocalRelation would otherwise evaluate Project-over-
  // LocalRelation eagerly and there would be no expression left to
  // rewrite (real scans are never local relations).
  private def floatArrays(s: SparkSession) =
    s.range(2).select(
      array((col("id") + 1).cast("float"), lit(2.0f), lit(3.0f)).as("a"),
      array(lit(4.0f), lit(5.0f), lit(6.0f)).as("b"))

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("optimizer rule rewrites the declarative HOF dot into the kernel") {
    val df = floatArrays(ext).select(hofDot(col("a"), col("b")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("floatvecdot"))
    assert(df.orderBy("d").collect().map(_.getDouble(0)).toSeq ==
      Seq(1.0 * 4 + 2 * 5 + 3 * 6, 2.0 * 4 + 2 * 5 + 3 * 6))

    // without the rule (plain session) the same query must agree
    val plain = floatArrays(spark).select(hofDot(col("a"), col("b")).as("d"))
    assert(!plain.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("floatvecdot"))
    assert(plain.orderBy("d").collect().map(_.getDouble(0)).toSeq ==
      Seq(32.0, 36.0))
  }

  test("rewrite preserves HOF semantics on ragged pairs (zip_with null-pads -> null)") {
    val df = ext.range(1).select(
        array(lit(1.0f), lit(2.0f)).as("a"), array(lit(3.0f)).as("b"))
      .select(hofDot(col("a"), col("b")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("floatvecdot")) // rule fired...
    assert(df.collect().head.isNullAt(0)) // ...and ragged still yields NULL
  }

  test("rule does NOT fire on shapes it cannot prove (non-float arrays, other folds)") {
    // double arrays: kernel reads floats, must not rewrite
    val dbl = ext.range(1).select(
        array(lit(1.0), lit(2.0)).as("a"), array(lit(3.0), lit(4.0)).as("b"))
      .select(hofDot(col("a"), col("b")).as("d"))
    assert(!dbl.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("floatvecdot"))
    assert(dbl.collect().head.getDouble(0) == 11.0)

    // a sum fold (no multiply) keeps its declarative form
    val sumFold = ext.range(1).select(
        array(lit(1.0f), lit(2.0f)).as("a"), array(lit(3.0f), lit(4.0f)).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!sumFold.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("floatvecdot"))
    assert(sumFold.collect().head.getDouble(0) == 10.0)
  }

  test("iterate is callable from SQL as a resolution-time macro") {
    // same MINSTD chain as q80, through ext.sql — the builder unrolls
    // at resolution, so the plan carries one nested expression
    val rows = ext.sql(
      """SELECT id, iterate('(x * 48271) % 2147483647', 'x', 3,
        |  id % 2147483646 + 1) AS v FROM range(5)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 5L) {
      var x = id % 2147483646L + 1
      (1 to 3).foreach(_ => x = (x * 48271) % 2147483647L)
      assert(rows(id) == x, s"id=$id")
    }
    // non-literal loop metadata and over-cap depths are refused
    intercept[Exception](ext.sql(
      "SELECT iterate('x+1', 'x', CAST(id AS INT), 0) FROM range(1)").collect())
    intercept[Exception](ext.sql(
      "SELECT iterate('x+1', 'x', 65, 0) FROM range(1)").collect())
  }
}
