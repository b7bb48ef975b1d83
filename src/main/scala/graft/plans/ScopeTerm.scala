package graft.plans

/** One `OPTIMIZE … WHERE` scope term: `col <op> 'value'` with
  * `op ∈ {=, >=, >, <=, <}` — Delta's own OPTIMIZE accepts arbitrary
  * partition predicates; this engine supports the comparison-conjunction
  * subset, which is exactly what selects WHOLE files by partition value
  * (`day >= '2024-01-01' AND day < '2024-02-01'`, the retention-window
  * maintenance shape). Parsed by [[GraftSqlParser.parseWhere]]; consumed
  * by the Delta and Iceberg maintenance writers, which canonicalize the
  * column spelling and type the value against the table's own schema. */
case class ScopeTerm(col: String, op: String, value: String) {
  def isEq: Boolean = op == "="
  def isLower: Boolean = op == ">" || op == ">="
  def isUpper: Boolean = op == "<" || op == "<="
  override def toString: String = s"$col $op '$value'"
}

object ScopeTerm {

  val Ops: Set[String] = Set("=", ">=", ">", "<=", "<")

  /** Per-column shape law, shared by the parser (spelling-level) and the
    * writers (post-canonicalization — `canon` maps a spelled column to
    * its resolved identity, so `Day >= '1' AND day < '3'` validates as
    * ONE column's range while `Day = '1' AND day = '2'` refuses):
    * exactly one equality, XOR at most one lower and one upper bound. */
  def validateShape(terms: Seq[ScopeTerm], canon: String => String): Unit =
    terms.groupBy(t => canon(t.col)).foreach { case (c, ts) =>
      val eqs = ts.count(_.isEq)
      val lo = ts.count(_.isLower)
      val hi = ts.count(_.isUpper)
      require(eqs <= 1,
        s"OPTIMIZE WHERE states '$c = …' $eqs times — a repeated " +
          "equality is either redundant or contradictory")
      require(eqs == 0 || (lo == 0 && hi == 0),
        s"OPTIMIZE WHERE mixes equality and range bounds on '$c' — " +
          "state one equality OR a range, not both")
      require(lo <= 1 && hi <= 1,
        s"OPTIMIZE WHERE states more than one " +
          s"${if (lo > 1) "lower" else "upper"} bound on '$c'")
    }

  /** Scope literal → typed comparison value for a partition field of
    * iceberg-style type `typ`: `long`/`int` → Long, `date` → epoch-day
    * Long (ISO `yyyy-MM-dd` or a raw integer — the manifest encoding),
    * `string` → String. Anything else refuses by name. */
  def typedValue(typ: String, colName: String, v: String): Any = typ match {
    case "string" => v
    case "date" =>
      try java.time.LocalDate.parse(v).toEpochDay
      catch { case _: java.time.format.DateTimeParseException =>
        try v.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"OPTIMIZE WHERE $colName: '$v' — the field is date-typed; " +
              "pass an ISO date ('yyyy-MM-dd') or its epoch-day integer") } }
    case "int" | "long" =>
      try v.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"OPTIMIZE WHERE $colName: '$v' — the field is $typ-typed; " +
            "pass a numeric literal") }
    case other => throw new IllegalArgumentException(
      s"OPTIMIZE WHERE $colName: partition fields of type '$other' " +
        "cannot scope a rewrite — supported: string, date, int, long")
  }

  /** Unsigned UTF-8 byte comparison — the SAME total order Spark's
    * `UTF8String.compareTo` gives the row-side scope predicates. Java's
    * `String.compareTo` orders by UTF-16 code UNIT, which disagrees with
    * byte order for supplementary-plane characters (a surrogate pair's
    * lead unit 0xD800–0xDBFF sorts BELOW 0xE000–0xFFFF in UTF-16 but its
    * UTF-8 encoding 0xF0… sorts ABOVE 0xEE…); file selection here and row
    * selection in the writers must agree on ONE order or a string range
    * scope over such partition values silently duplicates or loses rows. */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  /** Does partition value `pv` (Int/Long/String as the metadata carries
    * it) satisfy `<pv> op <lit>`? A type mismatch (e.g. a null-partition
    * sentinel where a number is expected) is NO MATCH, never an error —
    * unmatched partitions are simply out of scope. String comparison is
    * unsigned UTF-8 byte order ([[utf8Compare]] — matching the row-side
    * `UTF8String` binary order, so file and row selection agree even on
    * supplementary-plane partition values). */
  def satisfies(op: String, pv: Any, lit: Any): Boolean = {
    val cmp: Option[Int] = (pv, lit) match {
      case (a: java.lang.Number, b: java.lang.Number) =>
        Some(java.lang.Long.compare(a.longValue, b.longValue))
      case (a: String, b: String) => Some(Integer.signum(utf8Compare(a, b)))
      case _ => None
    }
    cmp.exists { c =>
      op match {
        case "=" => c == 0
        case ">" => c > 0
        case ">=" => c >= 0
        case "<" => c < 0
        case "<=" => c <= 0
        case other => throw new IllegalArgumentException(
          s"unknown scope operator '$other'")
      }
    }
  }
}
