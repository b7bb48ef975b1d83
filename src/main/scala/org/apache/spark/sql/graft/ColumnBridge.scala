package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4 made the conversion
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * libraries shipping native expressions (graft's `vec_dot`, `geo_cell`)
  * need this one-file shim inside the `org.apache.spark.sql` package — the
  * same technique other Spark-native extension libraries use. No Spark
  * internals are reimplemented here; both calls delegate. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` in Spark 4) — needed by library code that constructs
    * custom `LogicalPlan` nodes (graft's native as-of join). */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a frame (same `private[sql]` story). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
}
