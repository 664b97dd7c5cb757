package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Computed output routing R1-R3.
  *
  * The reference routes each message to a sink-specific destination via a
  * pure function of `(action, record, changes, metadata)`
  * (`/root/reference/lib/sequin/runtime/routing/consumers/` per-sink modules). Pure
  * column expressions here — codegen'd, no UDFs.
  */
object Routing {

  /** R1 (Kafka) — `topic = "sequin.<schema>.<table>"`, message key = group id
    * (`/root/reference/lib/sequin/runtime/routing/consumers/kafka.ex:28-35`).
    */
  def kafka(df: DataFrame, prefix: String = "sequin"): DataFrame =
    df.withColumn("topic",
        concat_ws(".", lit(prefix), col("table_schema"), col("table_name")))
      .withColumn("message_key", coalesce(col("group_id"), col("record_pk")))

  /** R1 (Redis stream) — key `sequin:<table>:<pks>`. */
  def redisKey(df: DataFrame): DataFrame =
    df.withColumn("redis_key",
      concat_ws(":", lit("sequin"), col("table_name"), col("record_pk")))

  /** R1 (Elasticsearch) — doc id from table + pk; delete action maps to a
    * delete op, everything else upserts
    * (`/root/reference/lib/sequin/runtime/routing/consumers/elasticsearch.ex`).
    */
  def elasticsearch(df: DataFrame): DataFrame =
    df.withColumn("es_doc_id", concat_ws("-", col("table_name"), col("record_pk")))
      .withColumn("es_op",
        when(col("action") === "delete", "delete").otherwise("index"))

  /** R3/Q33 — partition assignment by group hash
    * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:156-163`).
    * `pmod(hash(group_id), n)` matches Spark's own HashPartitioning, so a
    * later `repartition(n, col("group_id"))` reuses the same distribution.
    */
  def partitionBy(df: DataFrame, n: Int): DataFrame =
    df.withColumn("partition", pmod(hash(col("group_id")), lit(n)))
}
