package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle-SQL integer-aggregate convention, which cost round 4
  * seven red correctness rows: DuckDB `sum(BIGINT)` returns HUGEINT (and
  * `sum(INT)` HUGEINT too), which pandas renders as float (`99111.0`) while
  * Spark's BIGINT renders `99111` — the driver's string-hash gate then fails
  * even though the numbers are equal. The repo convention is to wrap every
  * integer `sum(...)` in the DuckDB SQL as `CAST(sum(...) AS BIGINT)` (or
  * VARCHAR when the value can exceed 2^63, e.g. q84's 60-bit hash sums).
  *
  * This spec scans every `SparkEntry.oracleSql` entry and fails on any
  * `sum(` that is neither CAST-wrapped, a window function (internal window
  * sums never reach the output as HUGEINT-rendered columns here), nor on
  * the justified allowlist (sums over DOUBLE columns, which DuckDB returns
  * as DOUBLE — no widening). Add new allowlist entries only with a comment
  * saying why the sum's argument is not an integer. */
class OracleConventionSpec extends AnyFunSuite {

  /** (query, exact sum argument) pairs allowed uncast because the argument
    * is a DOUBLE column (DuckDB sum(DOUBLE) stays DOUBLE — both engines
    * render float, no drift). Keyed per-argument so a future INTEGER sum
    * added to an allowlisted query is still caught. */
  private val doubleSumAllowlist: Set[(String, String)] = Set(
    ("q09_join_inner_agg", "l_quantity"),
    ("q71_salted_join", "l_quantity")
  )

  private val sumRe = "(?i)(?<![a-z0-9_])sum\\s*\\(".r
  private val castPrefixRe = "(?i)cast\\s*\\($".r

  /** Index of the ')' matching the '(' at `open`. */
  private def matchingClose(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  test("every integer sum() in oracle SQL is CAST-wrapped (HUGEINT rendering gate)") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      sumRe.findAllMatchIn(sql).flatMap { m =>
        val pre = sql.substring(0, m.start).stripTrailing()
        val castWrapped = castPrefixRe.findFirstIn(pre).isDefined
        val open = sql.indexOf('(', m.start)
        val close = matchingClose(sql, open)
        val isWindow = close >= 0 &&
          sql.substring(close + 1).stripLeading().toLowerCase.startsWith("over")
        val arg = if (close > open) sql.substring(open + 1, close).trim else ""
        if (castWrapped || isWindow || doubleSumAllowlist((name, arg))) None
        else Some(s"$name at offset ${m.start}: ...${sql.substring(m.start, math.min(sql.length, close + 1))}...")
      }
    }
    assert(violations.isEmpty,
      s"""|Uncast sum() in oracle SQL — DuckDB widens integer sums to HUGEINT,
          |pandas renders them as float (99111.0) and the driver's string-hash
          |gate fails against Spark's integer rendering. Wrap as
          |CAST(sum(...) AS BIGINT) (VARCHAR if it can exceed 2^63), or add a
          |justified doubleSumAllowlist entry if the argument is DOUBLE:
          |${violations.mkString("\n")}""".stripMargin)
  }
}
