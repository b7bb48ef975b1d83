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
    require(!df.columns.contains("violations"),
      "input already has a 'violations' column — annotate would silently clobber it")
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
    // metric names and aggregate columns travel POSITIONALLY (synthetic
    // c<i> aliases, metric name only ever a string literal) — a rule
    // named with quotes, spaces, or dots can never be parsed as SQL or
    // mis-resolve a column reference
    val metrics: Seq[(String, Column)] =
      ("valid_rows", sum(when(size(col("violations")) === 0, 1L).otherwise(0L))) +:
      ("quarantined_rows", sum(when(size(col("violations")) > 0, 1L).otherwise(0L))) +:
      rules.map(r =>
        (s"viol_${r.name}",
          sum(when(array_contains(col("violations"), r.name), 1L).otherwise(0L))))
    val aggs = metrics.zipWithIndex.map { case ((_, c), i) => c.as(s"c$i") }
    val aggd = annotated.agg(aggs.head, aggs.tail: _*)
    // unpivot to (metric, n) so the row set grows with the rule list
    val entries = metrics.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("metric"), col(s"c$i").as("n"))
    }
    aggd.select(explode(array(entries: _*)).as("e"))
      .select(col("e.metric").as("metric"), col("e.n").as("n"))
  }
}
