package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every oracle-checked operator query; each key has a
  * DuckDB-runnable equivalent in `oracleSql` (same column aliases, same
  * total ordering). Registries live under `graft.queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Enrichment lookup join (J1): CDC events enriched with the customer
    * dimension via broadcast left-outer join — the reference's hot path.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cdc = model.Cdc.fromEvents(Tables.events(spark, dir))
    val dim = Tables.customer(spark, dir)
    ops.Joins.enrich(cdc, dim, cdc("record_user_id"), dim("c_custkey"))
      .select(col("record_id"), col("action"), col("record_value"),
        col("c_name"), col("c_mktsegment"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
    graft.queries.FunctionQueries.queries ++
    graft.queries.TrainingQueries.queries ++
    graft.queries.IngestQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
    graft.queries.FunctionQueries.oracles ++
    graft.queries.TrainingQueries.oracles ++
    graft.queries.IngestQueries.oracles

  /** Large-SF oracle fixtures (see TrainingQueries.fixtureSql): SQL that
    * writes one-time per-dataset fixture tables, plus fixture-aware
    * oracle restatements that the checker uses ONLY when the fixture
    * parquet exists next to the SF's tables. The driver's gate (no
    * fixtures present) always runs the self-contained `oracleSql`.
    */
  def oracleFixtureSql: Map[String, String] =
    graft.queries.TrainingQueries.fixtureSql

  def oracleFixtureOverrides: Map[String, String] =
    graft.queries.TrainingQueries.oracleFixtureOverrides
}
