package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** The eager-execution carrier for graft's SQL DML rewrites (UPDATE /
  * MERGE INTO / row-level commands the V2 seam has no native write path
  * for): [[graft.plans.CatalogTableSubstitution]] replaces the resolved
  * command plan with one of these, and Spark's command execution runs
  * `body` on the driver — the body delegates to the format writers' own
  * single-commit machinery (`DeltaLogWriter.updateWhere/upsert`,
  * `IcebergWriter.updateWhere/upsert`), so the SQL spelling and the
  * Scala API share one implementation. Lives beside [[ColumnBridge]]
  * because `LeafRunnableCommand` composes cleanly only from inside the
  * `org.apache.spark.sql` package tree on Spark 4.
  *
  * `what` is the plan-visible description (EXPLAIN output); `body` is
  * deliberately in a second parameter list so plan equality/hashing
  * stays on the description, never on closure identity. */
case class GraftDmlCommand(what: String)(body: () => Unit)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    body()
    Seq.empty
  }
  // TreeNode.makeCopy reflects over the FULL constructor — the curried
  // body must ride along or plan cloning (QueryExecution caches a clone
  // of every command plan) dies with "wrong number of arguments"
  override protected def otherCopyArgs: Seq[AnyRef] = body :: Nil
  override def simpleString(maxFields: Int): String = s"GraftDmlCommand $what"
}
