package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the session_window boundary contract the q82 oracle replays:
  * a gap EQUAL to the duration still merges (new session only when the
  * gap strictly exceeds it), and the session end is last-event + gap. */
class SessionWindowSpec extends SparkSpec {
  test("session_window merges at diff == gap, splits past it, ends at last+gap") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:10")), // == gap: merges
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:25"))  // > gap: splits
    ).toDF("uid", "ts")
    val out = df.groupBy($"uid", session_window($"ts", "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".cast("string"), $"w.end".cast("string"), $"n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2026-01-01 00:00:00", "2026-01-01 00:00:20", 2L),
      ("2026-01-01 00:00:25", "2026-01-01 00:00:35", 1L)))
  }
}
