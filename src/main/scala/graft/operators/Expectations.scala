package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the Delta Live Tables / Delta CHECK
  * constraint pattern: declarative row predicates, each row annotated
  * with the names of the expectations it fails, then split into a valid
  * stream and a quarantine stream (fail-and-quarantine, not fail-the-job).
  *
  * Semantics: an expectation PASSES only when its predicate is TRUE —
  * NULL (e.g. a null operand) counts as a violation, exactly DLT's
  * `EXPECT` and SQL `CHECK` semantics under ternary logic.
  *
  * Scale shape: pure map-side projection — the violation array is a
  * codegen'd `array`/`filter` over the row, no shuffle, no UDF; the
  * split is two filters over one annotated frame, so a shared scan (or
  * cache) serves both streams. */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  /** Annotate each row with `violations: ARRAY<STRING>` — the names of
    * the failed expectations (empty array = clean row). */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation")
    val viols = rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name)))
    df.withColumn("violations",
      filter(array(viols: _*), v => v.isNotNull))
  }

  /** (valid, quarantined) — rows passing ALL expectations vs the rest
    * (quarantine keeps the violation list for triage). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    (annotated.where(size(col("violations")) === 0).drop("violations"),
      annotated.where(size(col("violations")) > 0))
  }

  /** Per-expectation violation counts plus the valid/quarantined totals —
    * the DLT expectations dashboard row set: `(metric, n)`. */
  def stats(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val annotated = annotate(df, rules)
    val aggs =
      sum(when(size(col("violations")) === 0, 1L).otherwise(0L)).as("valid_rows") +:
      sum(when(size(col("violations")) > 0, 1L).otherwise(0L)).as("quarantined_rows") +:
      rules.map(r =>
        sum(when(array_contains(col("violations"), r.name), 1L).otherwise(0L))
          .as(s"viol_${r.name}"))
    val aggd = annotated.agg(aggs.head, aggs.tail: _*)
    // unpivot to (metric, n) so the row set grows with the rule list
    val cols = Seq("valid_rows", "quarantined_rows") ++ rules.map(r => s"viol_${r.name}")
    aggd.selectExpr(s"stack(${cols.length}, " +
      cols.map(c => s"'$c', $c").mkString(", ") + ") AS (metric, n)")
  }
}
