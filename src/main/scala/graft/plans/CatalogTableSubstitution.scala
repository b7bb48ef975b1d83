package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualTo, Expression, SubqueryExpression, And => AndExpr}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.{ColumnBridge, GraftDmlCommand}

import graft.sources.GraftSqlTable

/** The analyzer half of [[graft.sources.GraftCatalog]] — the
  * DeltaAnalysis pattern: a `DataSourceV2Relation` over a
  * [[GraftSqlTable]] is REPLACED by the format reader's own logical
  * plan, re-aliased onto the relation's output attributes (explicit
  * exprIds, so every downstream reference keeps resolving). After this
  * rule the V2 relation is gone from the plan: Catalyst optimizes
  * ordinary parquet scans (plus the reader's DV/MoR joins where the
  * table carries them), so pushdown, pruning and join planning behave
  * exactly as the path-API reads — the catalog adds a NAME, not an
  * execution layer.
  *
  * `reread()` builds a FRESH plan (fresh expression ids) per relation
  * occurrence: a self-join of one catalog table substitutes two
  * independent subtrees and can never alias attributes across sides.
  * Installed by [[GraftExtensions]] as a resolution rule (post-hoc
  * batch — the relation is resolved by then, its output fixed).
  *
  * ROW-LEVEL DML lands here too (the reference's production loop is
  * SQL upsert-maintenance of a metastore table,
  * `02_geofraud_fraud.py:283-304`): a resolved `UPDATE ... SET ...
  * WHERE` or the canonical upsert-shaped `MERGE INTO` whose TARGET is a
  * [[GraftSqlTable]] rewrites to a [[GraftDmlCommand]] running the
  * format writers' own single-commit machinery (`updateWhere` /
  * `upsert`) — Spark's own SupportsRowLevelOperations path would
  * re-plan the table as a copy-on-write group rewrite; these writers
  * already commit merge-on-read deltas, which IS the 100 TB shape.
  * Spark's row-level rewrites (`RewriteUpdateTable` et al.) never fire
  * first: they pattern-match SupportsRowLevelOperations, which
  * GraftSqlTable deliberately does not implement. */
object CatalogTableSubstitution extends Rule[LogicalPlan] {
  // TARGETS of write/DML commands stay V2 relations untouched. An
  // INSERT's AppendData holds its target as `table: NamedRelation`
  // (not a tree child — verified structurally on Spark 4.1.2), so the
  // traversal cannot reach it; DELETE holds the target AS A CHILD and
  // rides SupportsDelete, so it too stays intact. UPDATE/MERGE targets
  // over a GraftSqlTable rewrite to eager commands HERE (their READ
  // sides — a MERGE source, an UPDATE condition — still substitute); on
  // any other table they pass through to Spark's own (refusing) path.
  // A relation that dodges substitution entirely (a DML-condition
  // subquery, a session without the extensions) fails at EXECUTION
  // through the plan-only scan stub's toBatch refusal — loud, with the
  // remedy named, never a silent mis-plan.
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case u: UpdateTable if u.resolved => rewriteUpdate(u)
    case u: UpdateTable => u
    case m: MergeIntoTable if m.resolved => rewriteMerge(m)
    case m: MergeIntoTable => m.copy(sourceTable = substitute(m.sourceTable))
    case p => substitute(p)
  }

  /** The graft table behind a DML target, seen through its alias. */
  private def graftTarget(t: LogicalPlan): Option[GraftSqlTable] =
    EliminateSubqueryAliases(t) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        Some(r.table.asInstanceOf[GraftSqlTable])
      case _ => None
    }

  /** Re-spell a resolved expression against the writer's OWN read frame:
    * attribute references become by-name lookups (the target is a single
    * table, so top-level names are unambiguous), and the Column resolves
    * inside `updateWhere`'s scan exactly as a user-written predicate
    * would. Subqueries are refused before this runs. */
  private def toCol(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def refuseSubqueries(what: String, name: String, es: Seq[Expression]): Unit =
    require(!es.exists(_.exists(_.isInstanceOf[SubqueryExpression])),
      s"$what $name: subqueries in DML conditions/assignments are not " +
        "supported by this catalog — materialize the subquery into the " +
        "source first")

  /** `UPDATE <cat>.ns.t SET c = expr, ... [WHERE pred]` → one
    * merge-on-read commit through the format writer. */
  private def rewriteUpdate(u: UpdateTable): LogicalPlan = graftTarget(u.table) match {
    case None => u
    case Some(g) =>
      val run = g.update.getOrElse(throw new UnsupportedOperationException(
        s"UPDATE ${g.name()}: the target was loaded time-traveled " +
          "(VERSION/TIMESTAMP AS OF) — a pinned historical read cannot be updated"))
      refuseSubqueries("UPDATE", g.name(),
        u.assignments.map(_.value) ++ u.condition)
      val assignments = u.assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE ${g.name()} assigns to '${other.sql}' — this catalog " +
              "updates top-level columns only")
        }
        name -> toCol(a.value)
      }
      val cond = u.condition.map(toCol).getOrElse(lit(true))
      // the FULL statement (assignment expressions + predicate) is the
      // plan-visible description: case-class equality/hashing rides on
      // it, and two UPDATEs differing only in SET values or WHERE must
      // not compare equal anywhere Catalyst dedupes by plan
      GraftDmlCommand(s"UPDATE ${g.name()} SET " +
        u.assignments.map(a => s"${a.key.sql} = ${a.value.sql}").mkString(", ") +
        u.condition.map(c => s" WHERE ${c.sql}").getOrElse(""))(
        () => run(assignments, cond))
  }

  /** `MERGE INTO <cat>.ns.t USING src ON t.k = s.k ...` in its three
    * canonical star shapes:
    *   - UPDATE SET * + INSERT *  → keyed upsert of the whole source;
    *   - INSERT * only            → append of source keys absent from
    *                                the target (the dedupe-insert);
    *   - UPDATE SET * only        → keyed upsert of source rows whose
    *                                keys exist in the target.
    * Anything else — clause conditions, partial SETs, DELETE actions,
    * NOT MATCHED BY SOURCE, schema evolution — refuses with the
    * canonical spelling named: the writers commit whole-row
    * merge-on-read deltas, and a partial/conditional merge would need
    * the copy-on-write group rewrite this engine deliberately avoids. */
  private def rewriteMerge(m: MergeIntoTable): LogicalPlan = graftTarget(m.targetTable) match {
    case None => m.copy(sourceTable = substitute(m.sourceTable))
    case Some(g) =>
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"MERGE INTO ${g.name()}: $why — this catalog runs the canonical " +
          "keyed-upsert shapes: MERGE INTO t USING s ON t.k = s.k " +
          "[WHEN MATCHED THEN UPDATE SET *] [WHEN NOT MATCHED THEN INSERT *]")
      if (m.withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION is not supported")
      if (m.notMatchedBySourceActions.nonEmpty)
        refuse("WHEN NOT MATCHED BY SOURCE clauses are not supported")
      refuseSubqueries("MERGE INTO", g.name(), Seq(m.mergeCondition))
      // one presence check covers every arm below: the catalog builds
      // merge/append/update together, all None iff the load was pinned
      val upsertRun = g.merge.getOrElse(throw new UnsupportedOperationException(
        s"MERGE INTO ${g.name()}: the target was loaded time-traveled " +
          "(VERSION/TIMESTAMP AS OF) — a pinned historical read cannot be merged into"))

      val tset = m.targetTable.outputSet
      val sset = m.sourceTable.outputSet
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case AndExpr(l, r) => conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      // ON must be a conjunction of same-named target=source column
      // equalities — those names ARE the upsert keys. The SPELLING is
      // semantic: `<=>` matches null-safely (the writers' native key
      // matching), while plain `=` keeps SQL's null semantics — a
      // NULL-keyed row matches nothing and routes to the INSERT arm.
      // Each key carries its spelling; a key written both ways takes
      // `=` (the stricter SQL contract).
      def keyOf(a: Expression, b: Expression): Option[String] = (a, b) match {
        case (x: AttributeReference, y: AttributeReference)
            if tset.contains(x) && sset.contains(y) &&
              x.name.equalsIgnoreCase(y.name) => Some(x.name)
        case (x: AttributeReference, y: AttributeReference)
            if sset.contains(x) && tset.contains(y) &&
              x.name.equalsIgnoreCase(y.name) => Some(y.name)
        case _ => None
      }
      val keyTerms = conjuncts(m.mergeCondition).map {
        case EqualTo(a, b) if keyOf(a, b).isDefined =>
          keyOf(a, b).get -> false
        case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(a, b)
            if keyOf(a, b).isDefined => keyOf(a, b).get -> true
        case other => refuse(s"ON clause term '${other.sql}' is not a " +
          "same-named target=source column equality")
      }
      val nullSafeKey: Map[String, Boolean] =
        keyTerms.groupBy(_._1).map { case (k, vs) => k -> vs.forall(_._2) }
      val keys = keyTerms.map(_._1).distinct

      // a star-shaped action: every TARGET column assigned its same-named
      // plain SOURCE column (possibly through the resolver's cast)
      def stripCast(e: Expression): Expression = e match {
        case c: Cast => stripCast(c.child)
        case x => x
      }
      def requireStar(what: String, asg: Seq[Assignment]): Unit = {
        val assigned = asg.map { a =>
          val k = a.key match {
            case ar: AttributeReference => ar.name
            case other => refuse(s"$what assigns to '${other.sql}' (nested fields)")
          }
          stripCast(a.value) match {
            case ar: AttributeReference if sset.contains(ar) &&
                ar.name.equalsIgnoreCase(k) => ()
            case other => refuse(s"$what sets $k = '${other.sql}', not the " +
              s"same-named source column — only SET * / INSERT * shapes map " +
              "to the writers' whole-row upsert")
          }
          k.toLowerCase(java.util.Locale.ROOT)
        }.toSet
        val want = g.schema().fieldNames
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        if (assigned != want)
          refuse(s"$what covers ${assigned.size} of ${want.size} target " +
            "columns — the writers replace WHOLE rows; use SET * / INSERT *")
      }

      val doUpdate = m.matchedActions match {
        case Seq() => false
        case Seq(UpdateAction(None, asg, _)) =>
          requireStar("WHEN MATCHED UPDATE", asg); true
        case Seq(UpdateAction(Some(_), _, _)) =>
          refuse("a conditional WHEN MATCHED AND ... clause")
        case Seq(_: DeleteAction) => refuse("WHEN MATCHED THEN DELETE " +
          "(spell it DELETE FROM ... WHERE key IN (...) or use the Scala API)")
        case other => refuse(s"${other.size} WHEN MATCHED clauses")
      }
      val doInsert = m.notMatchedActions match {
        case Seq() => false
        case Seq(InsertAction(None, asg)) =>
          requireStar("WHEN NOT MATCHED INSERT", asg); true
        case Seq(InsertAction(Some(_), _)) =>
          refuse("a conditional WHEN NOT MATCHED AND ... clause")
        case other => refuse(s"${other.size} WHEN NOT MATCHED clauses")
      }
      if (!doUpdate && !doInsert) refuse("no WHEN clauses")

      // the source, re-spelled to the TABLE's column order/names/types
      // (the star checks above guarantee the same-named columns exist)
      val spark = SparkSession.active
      val srcDf = ColumnBridge.dataFrame(spark, substitute(m.sourceTable))
      val tableFields = g.schema().fields
      val aligned = srcDf.select(tableFields.map(f =>
        col(s"`${f.name}`").cast(f.dataType).as(f.name)).toSeq: _*)
      val keyCols = keys.map(k => tableFields.map(_.name)
        .find(_.equalsIgnoreCase(k)).getOrElse(refuse(
          s"ON key '$k' is not a column of the target")))
      // table-resolved key names, each with its ON spelling's semantics
      val keyColsNS: Seq[(String, Boolean)] =
        keys.zip(keyCols).map { case (k, kc) => kc -> nullSafeKey(k) }
      val eqKeys = keyColsNS.filterNot(_._2).map(_._1)

      val what = s"MERGE INTO ${g.name()} ON " +
        keyColsNS.map { case (k, ns) => if (ns) s"$k<=>$k" else s"$k=$k" }
          .mkString(", ") +
        (if (doUpdate) " UPDATE" else "") + (if (doInsert) " INSERT" else "")
      GraftDmlCommand(what) { () =>
        import org.apache.spark.sql.functions.count
        // SQL MERGE cardinality: a target row matched by >1 source rows
        // is an error, not a double-land. The writers' upsert would
        // append every duplicate, so refuse duplicate source keys up
        // front when an UPDATE clause is present (one aggregate over the
        // batch side — planning-scale work). Insert-only merges keep
        // duplicates: inserting two same-keyed rows is legal SQL.
        if (doUpdate) {
          val dups = aligned.groupBy(keyCols.map(col): _*)
            .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1)
          require(dups.isEmpty,
            s"MERGE INTO ${g.name()}: the source carries duplicate ON " +
              s"keys (${keyCols.mkString(", ")}) — SQL MERGE forbids a " +
              "target row matching multiple source rows; dedupe the source first")
        }
        lazy val target = g.reread()
        // DUPLICATE-KEYED TARGET rows: SQL MERGE updates EACH matched
        // row, but the writers' whole-row upsert DV-kills every match
        // and appends ONE source row — a silent net row loss. Refuse up
        // front (one aggregate over the matchable target rows). Rows a
        // `=` key can never match (NULL-keyed) are exempt: SQL never
        // touches them and neither does any arm below.
        if (doUpdate) {
          val matchable =
            if (eqKeys.isEmpty) target
            else target.where(eqKeys.map(col(_).isNotNull).reduce(_ && _))
          val tdups = matchable.groupBy(keyCols.map(col): _*)
            .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1)
          require(tdups.isEmpty,
            s"MERGE INTO ${g.name()}: the TARGET carries duplicate ON " +
              s"keys (${keyCols.mkString(", ")}) — SQL updates each " +
              "matched row, but this catalog's whole-row upsert would " +
              "collapse them into one; dedupe the target first")
        }
        // a `=`-spelled key with NULL source values: SQL routes those
        // rows to the INSERT arm, the writers' upsert matches them
        // null-safely — the two disagree, so the combined arm refuses
        // rather than silently collapsing NULL groups. The single-arm
        // shapes below keep exact SQL semantics via per-spelling joins.
        if (doUpdate && doInsert && eqKeys.nonEmpty) {
          val nullKeyed = aligned
            .where(eqKeys.map(col(_).isNull).reduce(_ || _)).limit(1)
          require(nullKeyed.isEmpty,
            s"MERGE INTO ${g.name()}: the source carries NULL values in " +
              s"`=`-spelled ON keys (${eqKeys.mkString(", ")}) — SQL " +
              "routes those rows to the INSERT arm, but the writers " +
              "match keys null-safely; spell the ON with <=> for " +
              "null-safe matching, or split the NULL-keyed rows into a " +
              "separate INSERT")
        }
        def joinCond = keyColsNS.map { case (k, ns) =>
          if (ns) aligned(k) <=> target(k) else aligned(k) === target(k)
        }.reduce(_ && _)
        (doUpdate, doInsert) match {
          case (true, true) =>
            upsertRun(aligned, keyCols)
          case (false, true) =>
            // insert-only: append source keys ABSENT from the target —
            // under `=` a NULL-keyed source row matches nothing and
            // INSERTS, exactly SQL's arm routing
            val fresh = aligned.join(target, joinCond, "left_anti")
            g.append.get.apply(fresh)
          case (true, false) =>
            // update-only: upsert source rows whose keys EXIST in the
            // target — under `=` NULL-keyed source rows never hit
            val hits = aligned.join(target, joinCond, "left_semi")
            if (!hits.isEmpty) upsertRun(hits, keyCols)
          case _ => ()
        }
      }
  }

  private def substitute(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // `spark.readStream.table(name)` — GraftSqlTable deliberately does
      // not implement MICRO_BATCH_READ (a DSv2 stream would re-implement
      // parquet reading inside PartitionReaders); instead the relation
      // substitutes to a V1 StreamingRelation over
      // GraftTableStreamProvider, whose getBatch serves DATAFRAMES from
      // the format readers — the engine's offset log then provides
      // exactly-once with resume. Output re-aliased like the batch path.
      case sr: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if sr.table.isInstanceOf[GraftSqlTable] =>
        val g = sr.table.asInstanceOf[GraftSqlTable]
        if (g.isTravelled) throw new UnsupportedOperationException(
          s"readStream.table on ${g.name()}: the table was loaded " +
            "time-traveled (VERSION/TIMESTAMP AS OF) — a pinned " +
            "historical read cannot stream")
        val opts = Map(
          "path" -> g.location,
          "format" -> (if (g.isDeltaTable) "delta" else "iceberg")) ++
          (Option(sr.extraOptions.get("startVersion"))
            .map("startVersion" -> _))
        val v1 = org.apache.spark.sql.graft.StreamBridge.v1StreamingRelation(
          SparkSession.active,
          classOf[org.apache.spark.sql.graft.GraftTableStreamProvider].getName,
          opts, g.schema())
        require(v1.output.length == sr.output.length &&
            v1.output.zip(sr.output).forall { case (in, out) =>
              in.name == out.name && in.dataType == out.dataType },
          s"streaming relation for ${g.name()} emits " +
            s"(${v1.output.map(_.name).mkString(", ")}) but the relation " +
            s"expects (${sr.output.map(_.name).mkString(", ")})")
        Project(sr.output.zip(v1.output).map { case (out, in) =>
          Alias(in, out.name)(exprId = out.exprId)
        }, v1)
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        val child = r.table.asInstanceOf[GraftSqlTable].reread()
          .queryExecution.analyzed
        // names AND types positionally equal — the pinned version makes
        // drift impossible in normal operation, so a mismatch here means
        // a reader bug; aliasing on length alone could mislabel a column
        val drift = r.output.zip(child.output).collect {
          case (out, in) if out.name != in.name || out.dataType != in.dataType =>
            s"${out.name}: ${out.dataType.simpleString} vs " +
              s"${in.name}: ${in.dataType.simpleString}"
        }
        require(child.output.length == r.output.length && drift.isEmpty,
          s"catalog table ${r.table.name()}: reader plan emits " +
            s"(${child.output.map(_.name).mkString(", ")}) but the " +
            s"relation expects (${r.output.map(_.name).mkString(", ")})" +
            (if (drift.nonEmpty) s" — drift: ${drift.mkString("; ")}" else "") +
            " — the table changed shape between load and analysis")
        Project(r.output.zip(child.output).map { case (out, in) =>
          Alias(in, out.name)(exprId = out.exprId)
        }, child)
    }
}
