package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-scoping configuration (reference F1).
  *
  * Mirrors `/root/reference/lib/sequin/consumers/source.ex:13-53`:
  * `include_schemas` xor `exclude_schemas`, `include_table_oids` xor
  * `exclude_table_oids`; evaluation order excl-schema → incl-schema →
  * excl-table → incl-table (source.ex:44-52). As plain `isin` predicates the
  * conjunction short-circuits inside whole-stage codegen and is pushed to the
  * parquet/JDBC scan by Catalyst — at 100 TB this is the difference between
  * scanning one schema's partitions and scanning everything.
  */
final case class SourceScope(
    includeSchemas: Option[Seq[String]] = None,
    excludeSchemas: Option[Seq[String]] = None,
    includeTableOids: Option[Seq[Long]] = None,
    excludeTableOids: Option[Seq[Long]] = None) {
  require(includeSchemas.isEmpty || excludeSchemas.isEmpty,
    "include_schemas and exclude_schemas are mutually exclusive")
  require(includeTableOids.isEmpty || excludeTableOids.isEmpty,
    "include_table_oids and exclude_table_oids are mutually exclusive")

  def predicate: Column = {
    val checks = Seq(
      excludeSchemas.map(s => !col("table_schema").isin(s: _*)),
      includeSchemas.map(s => col("table_schema").isin(s: _*)),
      excludeTableOids.map(o => !col("table_oid").isin(o: _*)),
      includeTableOids.map(o => col("table_oid").isin(o: _*))).flatten
    checks.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** A typed column predicate (reference F3, WAL-pipeline column filters).
  *
  * Semantics from `/root/reference/lib/sequin/replication/source_table/
  * column_filter.ex:196-296` and eval in
  * `/root/reference/lib/sequin/consumers/consumers.ex:1284-1369`:
  * comparators `== != > < >= <= in not_in is_null not_null`; value types
  * `string | cistring | number | boolean | datetime | null` drive coercion
  * (consumers.ex:1294-1312; `cistring` compares case-insensitively,
  * datetimes are promoted to UTC timestamps); `jsonbPath` extracts `a.b.c`
  * from a JSON column before comparing; delete events evaluate against the
  * old image (callers pass the old-image column for deletes).
  */
final case class ColumnFilter(
    field: String,
    op: String,
    values: Seq[String] = Nil,
    valueType: String = "string",
    jsonbPath: Option[String] = None) {

  private def typedCol(c: Column): Column = valueType match {
    case "number"   => c.cast("double")
    case "boolean"  => c.cast("boolean")
    case "datetime" => c.cast("timestamp")
    case "cistring" => lower(c)
    case _          => c
  }

  private def typedLit(v: String): Column = valueType match {
    case "number"   => lit(v.toDouble)
    case "boolean"  => lit(v.toBoolean)
    case "datetime" => lit(java.sql.Timestamp.valueOf(v))
    case "cistring" => lit(v.toLowerCase)
    case _          => lit(v)
  }

  def predicate: Column = {
    val base = jsonbPath match {
      case Some(p) => get_json_object(col(field), "$." + p)
      case None    => col(field)
    }
    val c = typedCol(base)
    val vs = values.map(typedLit)
    op match {
      case "=="       => c === vs.head
      case "!="       => c =!= vs.head
      case ">"        => c > vs.head
      case "<"        => c < vs.head
      case ">="       => c >= vs.head
      case "<="       => c <= vs.head
      case "in"       => vs.map(c === _).reduce(_ || _)
      case "not_in"   => !vs.map(c === _).reduce(_ || _)
      case "is_null"  => c.isNull
      case "not_null" => c.isNotNull
      case other      => throw new IllegalArgumentException(s"unknown op $other")
    }
  }
}

/** Filters F1-F6 over the CDC envelope. All are single `Column` predicates:
  * Catalyst pushes them below projects and into the scan, and the `And`
  * chain short-circuits cheapest-first exactly like the reference's
  * hand-ordered eval (message_handler.ex:222-241).
  */
object Filters {

  /** F1 — schema/table scoping. */
  def sourceScope(df: DataFrame, scope: SourceScope): DataFrame =
    df.filter(scope.predicate)

  /** F2 — action membership (`sink_consumer.ex:109`, consumers.ex:1188-1199).
    * Backfill `read` events always pass (consumers.ex:1192).
    */
  def actionFilter(df: DataFrame, actions: Seq[String]): DataFrame =
    df.filter(col("action") === "read" || col("action").isin(actions: _*))

  /** F3 — typed column-filter conjunction. */
  def columnFilters(df: DataFrame, filters: Seq[ColumnFilter]): DataFrame =
    df.filter(filters.map(_.predicate).reduceOption(_ && _).getOrElse(lit(true)))

  /** F5 — payload-size guard: drop events over `maxBytes`
    * (message_handler.ex:161-169; 5 MB const :28-30).
    */
  def payloadSizeGuard(df: DataFrame, maxBytes: Long = 5L * 1024 * 1024): DataFrame =
    df.filter(col("byte_size") <= maxBytes)

  /** F6 — drop changes to the engine's own internal schemas
    * (slot_producer/processor.ex:247-251).
    */
  def rejectInternalSchemas(df: DataFrame, internal: Seq[String]): DataFrame =
    df.filter(!col("table_schema").isin(internal: _*))

  /** W8 — load shedding with the reference's policy distinction
    * (`load_shedding_policy: pause_on_full | discard_on_full`,
    * transforms.ex:945-950; buffers-full → pause replication,
    * slot_message_store.ex:15).
    *
    * `pause_on_full` is Spark-native backpressure: admission control
    * (maxOffsetsPerTrigger / maxFilesPerTrigger) throttles the source and
    * nothing is dropped — this function is the identity. `discard_on_full`
    * keeps the oldest `maxPending` events per delivery group in cursor
    * order and discards the overflow (the buffer-full discard, batch
    * rendition per micro-batch).
    */
  def shedOverflow(df: DataFrame, maxPending: Int,
      policy: String = "pause_on_full"): DataFrame = policy match {
    case "pause_on_full" => df
    case "discard_on_full" =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("group_id")
        .orderBy(col("commit_lsn"), col("commit_idx"))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxPending)
        .drop("__rn")
    case other =>
      throw new IllegalArgumentException(
        s"load_shedding_policy must be pause_on_full or discard_on_full, got $other")
  }
}
