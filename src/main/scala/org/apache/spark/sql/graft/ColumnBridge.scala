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
}
