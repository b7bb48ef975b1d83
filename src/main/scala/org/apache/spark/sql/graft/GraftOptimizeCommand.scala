package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

/** Eager carrier for the SQL `OPTIMIZE <table> [ZORDER BY (cols)]`
  * statement ([[graft.plans.GraftSqlParser]] parses it — the literal
  * maintenance line a reference user runs,
  * `01_geofraud_clustering.py:440`). Name resolution happens at RUN time
  * against the session's V2 catalog manager: a first part that names a
  * registered catalog is the catalog, otherwise the current catalog is
  * used — either way it must be a [[graft.sources.GraftCatalog]], whose
  * `optimizeZOrder` routes to the format writers' own maintenance passes
  * (Delta bin-pack/cluster rewrite, Iceberg clustered compaction — the
  * CALL-procedure machinery). Returns the same one-row (metric, value)
  * outcome surface as `CALL <cat>.system.optimize(...)`.
  *
  * All semantic fields sit in the single constructor list, so plan
  * equality/hashing tracks the full statement. */
case class GraftOptimizeCommand(nameParts: Seq[String], zorderBy: Seq[String],
                                where: Seq[graft.plans.ScopeTerm] = Seq.empty)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("metric", StringType, nullable = false)(),
    AttributeReference("value", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cm = sparkSession.sessionState.catalogManager
    val (plugin, tableName) =
      if (nameParts.length >= 2 && cm.isCatalogRegistered(nameParts.head))
        (cm.catalog(nameParts.head), nameParts.tail.mkString("."))
      else (cm.currentCatalog, nameParts.mkString("."))
    plugin match {
      case g: graft.sources.GraftCatalog =>
        g.optimizeZOrder(sparkSession, tableName, zorderBy, where = where)
          .map { case (metric, value) => Row(metric, value) }
      case other => throw new UnsupportedOperationException(
        s"OPTIMIZE ${nameParts.mkString(".")}: catalog '${other.name()}' " +
          "is not a graft catalog — qualify the table as " +
          "<graft-catalog>.<ns>.<table> or set the graft catalog current")
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftOptimizeCommand ${nameParts.mkString(".")}" +
      (if (where.nonEmpty) s" WHERE ${where.mkString(" AND ")}" else "") +
      (if (zorderBy.nonEmpty) s" ZORDER BY (${zorderBy.mkString(", ")})"
       else "")
}
