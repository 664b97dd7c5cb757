package graft.ops

import graft.streaming.ConsumerConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consumer fan-out (A1): match one decoded change stream against N
  * consumer configurations in a SINGLE pass — the reference decodes once
  * and shares across consumers (`/root/reference/lib/sequin/runtime/
  * message_handler.ex:214-251`); Spark's rendition is one scan with N
  * predicate aggregates, not N scans.
  */
object Fanout {

  /** The consumer's full match predicate (scope ∧ actions ∧ filters). */
  def matchPredicate(cfg: ConsumerConfig): Column = {
    val scopeP = cfg.scope.predicate
    val actionP = col("action") === "read" || col("action").isin(cfg.actions: _*)
    val filterP = cfg.filters.map(_.predicate).reduceOption(_ && _).getOrElse(lit(true))
    scopeP && actionP && filterP
  }

  /** Matched-event count per consumer, one scan: N conditional sums then
    * unpivot to (consumer, n) rows.
    */
  def matchCounts(events: DataFrame, configs: Seq[ConsumerConfig]): DataFrame = {
    // Synthetic c$i column names keep arbitrary consumer names (quotes,
    // backticks) out of the resolver; coalesce maps the empty-input sum
    // (NULL) to 0. Names re-enter only as literals in the unpivot.
    val aggs = configs.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(matchPredicate(c), 1L).otherwise(0L)), lit(0L)).as(s"c$i")
    }
    val wide = events.agg(aggs.head, aggs.tail: _*)
    val stackArgs = lit(configs.size) +: configs.zipWithIndex.flatMap {
      case (c, i) => Seq(lit(c.name), col(s"c$i"))
    }
    wide.select(stack(stackArgs: _*).as(Seq("consumer", "n")))
      .orderBy("consumer")
  }

  /** Per-consumer filtered streams sharing one source DataFrame (the
    * runtime form: each becomes a sink branch of the same micro-batch).
    */
  def split(events: DataFrame, configs: Seq[ConsumerConfig]): Map[String, DataFrame] =
    configs.map(c => c.name -> events.filter(matchPredicate(c))).toMap
}
