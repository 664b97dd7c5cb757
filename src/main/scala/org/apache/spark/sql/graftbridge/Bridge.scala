package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's custom
  * Catalyst expressions can be exposed as user-facing `Column`s from
  * outside the `org.apache.spark.sql` package.
  */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Non-blocking read of an Observation's metrics row
    * (`getRowOrEmpty` is `private[sql]`): None until the listener bus
    * has delivered the action's metrics. `Observation.get` BLOCKS on
    * that bus — ~150 ms measured on a single-event micro-batch — so hot
    * paths poll this instead and degrade gracefully.
    */
  def observedRow(o: org.apache.spark.sql.Observation)
      : Option[org.apache.spark.sql.Row] =
    o.getRowOrEmpty
}
