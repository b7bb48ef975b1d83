package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser front-end for the ONE maintenance statement the reference's own
  * notebooks type that Spark's grammar lacks:
  *
  * {{{ OPTIMIZE <table> [WHERE <partition comparison conjunction>]
  *     [ZORDER BY (col, col, ...)] }}}
  *
  * — the literal `OPTIMIZE {} ZORDER BY (user, h3)` a reference user runs
  * (`01_geofraud_clustering.py:440`), plus Delta's partition-scoped form
  * (`OPTIMIZE t WHERE day = '3'`). The statement parses to a
  * [[org.apache.spark.sql.graft.GraftOptimizeCommand]], which resolves the
  * (possibly catalog-qualified) name through the session's V2 catalog
  * manager at run time and routes to the same format-writer maintenance
  * passes the `CALL <cat>.system.optimize(...)` procedure drives — SQL
  * spelling and procedure share one implementation.
  *
  * Everything that is not an OPTIMIZE statement delegates to Spark's own
  * parser untouched (the wrapper adds no grammar ambiguity: `OPTIMIZE` is
  * not a Spark statement keyword). An OPTIMIZE statement this front-end
  * cannot shape-match (a non-comparison WHERE, extra clauses) refuses
  * loudly with the supported form named, rather than falling through to
  * Spark's opaque "syntax error at OPTIMIZE". */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseOptimize(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** `OPTIMIZE name [WHERE <partition comparison conjunction>] [ZORDER BY
    * (c1, c2, ...)]` — names are dotted parts, each part optionally
    * backticked (a backticked part containing a literal dot is out of
    * scope for this front-end). The WHERE grammar is Delta's own OPTIMIZE
    * scope: comparisons on partition columns, AND-conjoined. */
  private val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+([`\w.]+)(?:\s+WHERE\s+(.+?))??\s*(?:ZORDER\s+BY\s*\(\s*([^)]+?)\s*\))?\s*;?\s*""".r

  private val CmpTerm =
    """(?is)\s*`?(\w+)`?\s*(>=|<=|=|>|<)\s*(?:'([^']*)'|"([^"]*)"|([\w.\-:]+))\s*""".r

  /** Partition-scope predicate → ordered comparison terms. The grammar
    * is Delta's own OPTIMIZE scope, extended to RANGE conjunctions:
    * `col = v`, `col >= lo AND col < hi`, mixed across columns — each
    * comparison selects whole files by partition value. Per column the
    * shape is validated here (spelling-level; the writers re-validate
    * after canonicalizing case): exactly one equality, XOR at most one
    * lower bound (`>`/`>=`) and at most one upper bound (`<`/`<=`). */
  private[plans] def parseWhere(cond: String): Seq[ScopeTerm] = {
    val terms = cond.split("(?i)\\s+AND\\s+").toSeq.map {
      case CmpTerm(k, op, sq, dq, bare) =>
        ScopeTerm(k, op, Seq(sq, dq, bare).find(_ != null).get)
      case other => throw new IllegalArgumentException(
        "OPTIMIZE WHERE supports partition-column comparison " +
          "conjunctions — `col = 'v'`, `col >= 'lo' AND col < 'hi'`; " +
          "got: " + other.trim)
    }
    ScopeTerm.validateShape(terms, identity)
    terms
  }

  private def unquote(part: String): String =
    part.stripPrefix("`").stripSuffix("`")

  /** Leading SQL comments (`-- …\n`, `/* … */`) and whitespace, stripped
    * iteratively — so a commented OPTIMIZE statement still reaches this
    * front-end (and its helpful refusal) instead of Spark's opaque
    * "syntax error at OPTIMIZE". */
  private[plans] def stripLeadingComments(sql: String): String = {
    var s = sql
    var changed = true
    while (changed) {
      val t = s.dropWhile(_.isWhitespace)
      val u =
        if (t.startsWith("--")) t.dropWhile(_ != '\n')
        else if (t.startsWith("/*")) {
          val end = t.indexOf("*/", 2)
          if (end < 0) "" else t.substring(end + 2)
        } else t
      changed = u != s
      s = u
    }
    s
  }

  /** `OPTIMIZE` as the statement's first WORD — `OPTIMIZER_HINTS …` or any
    * other token merely prefixed with it delegates to Spark's own parser
    * (and its own error) instead of this front-end's refusal. */
  private val OptimizeLead = """(?is)OPTIMIZE\b.*""".r

  private[plans] def parseOptimize(sqlText: String): Option[LogicalPlan] =
    stripLeadingComments(sqlText) match {
      case OptimizeStmt(name, where, zcols) =>
        val parts = name.split('.').toSeq.map(unquote).filter(_.nonEmpty)
        require(parts.nonEmpty, s"OPTIMIZE: empty table name in '$sqlText'")
        val cols = Option(zcols).toSeq
          .flatMap(_.split(',').toSeq).map(s => unquote(s.trim))
          .filter(_.nonEmpty)
        val scope = Option(where).map(parseWhere).getOrElse(Seq.empty)
        Some(org.apache.spark.sql.graft.GraftOptimizeCommand(parts, cols, scope))
      case other if OptimizeLead.pattern.matcher(other).matches() =>
        throw new IllegalArgumentException(
          "OPTIMIZE: this front-end accepts exactly 'OPTIMIZE <table> " +
            "[WHERE <partition comparison conjunction>] " +
            "[ZORDER BY (col, ...)]'; got: " + other.trim)
      case _ => None
    }
}
