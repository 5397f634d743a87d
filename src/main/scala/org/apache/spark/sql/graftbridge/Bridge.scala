package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column and LogicalPlan -> DataFrame bridge. Spark 4 made
  * the converters `private[sql]` (org.apache.spark.sql.classic
  * .ExpressionUtils / classic.Dataset.ofRows), so custom Catalyst
  * expressions and plan nodes need this one-file shim inside the sql
  * package hierarchy to surface through the public API. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unload every state-store provider held by this JVM. A finished
    * streaming query only DEACTIVATES its providers; the actual unload
    * (closing RocksDB instances, deleting their working dirs) waits for the
    * 60 s maintenance cycle, so a dense replay sequence accumulates dozens
    * of dead providers and then pays an unload/snapshot storm mid-run.
    * `StateStore.unloadAll` is `private[sql]`, hence this bridge. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
