package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the single latest right row whose
  * timestamp is at or before the left row's, per key ("the value in effect
  * at time t"). Spark has no native ASOF JOIN; the naive spelling is a
  * non-equi join that plans as a broadcast-nested-loop / cartesian.
  *
  * This is the scale formulation: tag both sides, union, and run ONE
  * per-key partitioned window that carries the latest right-row payload
  * forward — cost is a single shuffle on the key plus an in-partition
  * sort, no pair blowup, every key processed in parallel.
  *
  * Right-row payloads travel as one struct, so `last(_, ignoreNulls)`
  * picks the latest right ROW atomically — legitimate nulls inside a
  * payload column do not fall back to an older row, matching ASOF
  * semantics. Right rows at exactly the left timestamp are visible
  * (inclusive `<=`), ordered before left rows at the same instant. */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTsCol: String, rightTsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => keyCols.contains(c) || c == rightTsCol).toSeq
    val leftRest = left.columns.filterNot(c => keyCols.contains(c) || c == leftTsCol).toSeq
    require(payload.intersect(leftRest).isEmpty,
      s"left and right share non-key columns: ${payload.intersect(leftRest).mkString(", ")}")
    val reserved = Seq(leftTsCol, "__ts", "__tag", "__p", "__m")
    val clashes = (payload ++ leftRest).intersect(reserved)
    require(clashes.isEmpty,
      s"column names collide with the left timestamp or internals: ${clashes.mkString(", ")}")
    val payloadType = StructType(payload.map(c => right.schema(right.schema.fieldIndex(c))))

    val l = left.select(
      keyCols.map(col) ++ Seq(col(leftTsCol).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(payloadType).as("__p")) ++ leftRest.map(col): _*)
    // a NULL right timestamp has no position on the timeline — ASOF
    // semantics (ts >= NULL is never true) say it can never be a match;
    // unfiltered it would sort first and become everyone's fallback match
    val r = right.where(col(rightTsCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(rightTsCol).as("__ts"), lit(0).as("__tag"),
        struct(payload.map(col): _*).as("__p")) ++
        leftRest.map(c => lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(keyCols.map(col) ++ Seq(col("__ts").as(leftTsCol)) ++ leftRest.map(col) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** [[leftAsOf]] through the NATIVE whole-operator path
    * ([[graft.plans.AsOfJoinNode]] → `AsOfJoinStrategy` →
    * `AsOfJoinExec`): one co-partitioned sort-merge pass instead of the
    * union + carry-forward window — no union row blowup, no window state.
    * Same contract and output column order; requires the
    * [[graft.plans.GraftExtensions]] strategy to be installed. Output
    * column order differs from input order only in that right payload
    * columns follow all left columns (identical to [[leftAsOf]]'s
    * key/ts/rest/payload order when the left frame is keys ++ ts ++ rest). */
  def leftAsOfNative(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftTsCol: String, rightTsCol: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(keyCols.nonEmpty, "leftAsOfNative needs at least one key column")
    val payload = right.columns.filterNot(c => keyCols.contains(c) || c == rightTsCol).toSeq
    val leftRest = left.columns.filterNot(c => keyCols.contains(c) || c == leftTsCol).toSeq
    require(payload.intersect(leftRest).isEmpty,
      s"left and right share non-key columns: ${payload.intersect(leftRest).mkString(", ")}")
    // NULL right timestamps have no timeline position — never a match.
    // Re-alias every right column: when both sides derive from the same
    // scan they share exprIds, and the re-analysis DeduplicateRelations
    // pass would renumber the right subtree out from under the attribute
    // references captured below — fresh top-level alias ids survive it.
    val lp = ColumnBridge.analyzed(left)
    val rp = ColumnBridge.analyzed(right.where(col(rightTsCol).isNotNull)
      .select(right.columns.toSeq.map(c => col(c).as(c)): _*))
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${plan.output.map(_.name).mkString(",")}"))
    val lKeys = keyCols.map(attr(lp, _))
    val rKeys = keyCols.map(attr(rp, _))
    val lTs = attr(lp, leftTsCol)
    val rTs = attr(rp, rightTsCol)
    // the merge pass matches keys by UnsafeRow BYTE equality and orders by
    // the LEFT side's timestamp type — an int-vs-bigint key or mismatched
    // timestamp type would silently produce all-unmatched/mis-ordered
    // output instead of failing; no implicit coercion on the native path
    require(lKeys.map(_.dataType) == rKeys.map(_.dataType),
      s"as-of key types differ: left=${lKeys.map(_.dataType.simpleString).mkString(",")} " +
        s"right=${rKeys.map(_.dataType.simpleString).mkString(",")} — cast both sides to " +
        "identical types first")
    require(lTs.dataType == rTs.dataType,
      s"as-of timestamp types differ: left $leftTsCol=${lTs.dataType.simpleString} " +
        s"right $rightTsCol=${rTs.dataType.simpleString} — cast both sides to identical " +
        "types first")
    val node = graft.plans.AsOfJoinNode(lp, rp,
      lKeys, rKeys, lTs, rTs,
      payload.map(attr(rp, _)))
    // same output shape as leftAsOf: keys, ts, left rest, then payload
    ColumnBridge.dataFrame(left.sparkSession, node)
      .select(keyCols.map(col) ++ Seq(col(leftTsCol)) ++ leftRest.map(col) ++
        payload.map(col): _*)
  }
}
