package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoFunctions

/** SURVEY §2 operator inventory as driver-checkable queries: each entry has
  * a Spark implementation and (in `oracle`) an exactly-equivalent DuckDB SQL
  * over the same parquet tables. Column names and value types are aligned on
  * both sides (the driver hash-compares after sorting columns by name).
  *
  * Covers: S1/S2/S5 (scans+sinks), P1-P7 (projections/filters), J1-J4/J6
  * (joins incl. the reference's flagship left_outer+IS NULL ≡ anti-join,
  * `02_geofraud_fraud.py:62-68`), A1-A6/A11 (aggregations), O1-O3 (sorts),
  * F1-F3/F5-F6 (scalar functions incl. geo cell + haversine + TF-IDF,
  * `01_geofraud_clustering.py:386-418`), U2 (explode). */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2 + P1/P2/P4/P7 + O3: parquet scan, filter, project, literal, limit
    "q01_scan_filter_project" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_totalprice", lit(1).as("one"))
        .orderBy($"o_orderkey").limit(100)
    }),

    // A1 + O1: hash aggregate count (the reference's density profile,
    // 01_geofraud_clustering.py:74-79)
    "q02_groupby_count" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    }),

    // A2: sum(lit(1)) spelling of count (01_geofraud_clustering.py:394)
    "q03_groupby_sum_lit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_linestatus").agg(sum(lit(1)).as("tf"))
        .orderBy($"l_linestatus")
    }),

    // A3: group-by max (01_geofraud_clustering.py:454)
    "q04_groupby_max" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_returnflag")
        .agg(max($"l_extendedprice").as("max_price"))
        .orderBy($"l_returnflag")
    }),

    // A4: collect_list grouped array agg (01_geofraud_clustering.py:188).
    // Emitted as a joined string: the driver's pandas compare cannot sort
    // array cells, so the hash sees a scalar while collect_list is still
    // the operator under test.
    "q05_collect_list" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").filter($"l_orderkey" < 100)
        .groupBy($"l_orderkey")
        .agg(array_join(sort_array(collect_list($"l_linenumber")).cast("array<string>"), ",").as("lns"))
        .orderBy($"l_orderkey")
    }),

    // A5: distinct (01_geofraud_clustering.py:392)
    "q06_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // A6: global count (01_geofraud_clustering.py:409)
    "q07_global_count" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))
    }),

    // O1 + O3: global sort desc + limit
    "q08_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select($"o_orderkey", $"o_totalprice").limit(20)
    }),

    // J1 + A1: single-key equi-join + agg (01_geofraud_clustering.py:390)
    "q09_join_inner_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("cnt"), sum($"l_quantity").as("sum_qty"))
        .orderBy($"p_brand")
    }),

    // J2: composite-key equi-join (01_geofraud_clustering.py:401)
    "q10_join_composite" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val lastLine = li.groupBy($"l_orderkey").agg(max($"l_linenumber").as("l_linenumber"))
      li.join(lastLine, Seq("l_orderkey", "l_linenumber"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .orderBy($"l_orderkey")
    }),

    // J3: left anti join — THE anomaly-extraction shape (02_geofraud_fraud.py:62-68)
    "q11_anti_join" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 150000.0)
      t(s, dir, "customer").join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name").orderBy($"c_custkey")
    }),

    // J3 parity spelling + P5 + P3: left_outer + IS NULL + drop
    "q12_leftouter_isnull" -> ((s, dir) => {
      import s.implicits._
      val knownUsers = t(s, dir, "orders").filter($"o_totalprice" > 150000.0)
        .select($"o_custkey").distinct()
      t(s, dir, "customer").join(knownUsers, $"c_custkey" === $"o_custkey", "left_outer")
        .filter($"o_custkey".isNull)
        .drop("o_custkey")
        .select($"c_custkey").orderBy($"c_custkey")
    }),

    // J4/J6: broadcast dim joins (small side explicitly broadcast)
    "q13_broadcast_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("cnt"))
        .orderBy($"n_name")
    }),

    // F1/U1: geo cell bucketing — the reference's density profile at res 9
    // (01_geofraud_clustering.py:74-79), over deterministically derived points
    "q14_geo_cell" -> ((s, dir) => {
      import s.implicits._
      Tables.points(s, dir)
        .withColumn("cell", GeoFunctions.geoCell($"latitude", $"longitude", 9))
        .groupBy($"cell").agg(count(lit(1)).as("cnt"))
        .orderBy($"cell")
    }),

    // F2: haversine distance predicate (01_geofraud_clustering.py:20)
    "q15_haversine" -> ((s, dir) => {
      import s.implicits._
      // fan = false: one haversine + a count is cheaper serial than the
      // round-robin exchange the fan-out would add (measured +0.4 s)
      Tables.points(s, dir, fan = false)
        .filter(GeoFunctions.haversineMeters($"latitude", $"longitude",
          lit(40.73), lit(-73.98)) <= lit(3000.0))
        .agg(count(lit(1)).as("n"))
    }),

    // F3/F6 + J1/J2 + A2/A5/A6: the full TF-IDF personalization chain
    // (01_geofraud_clustering.py:386-418) on derived points at res 9
    "q16_tfidf" -> ((s, dir) => {
      import s.implicits._
      val pointsCells = Tables.points(s, dir)
        .select($"user_id", GeoFunctions.geoCell($"latitude", $"longitude", 9).as("cell"))
      // here (unlike GeoFraudPipeline.tfidfTiles, whose tile set carries
      // layer cells beyond the points' own cells) the "document" set IS the
      // points' (user, cell) pairs — so tf and df both derive from ONE
      // grouped scan: tf = points per (user, cell), df = distinct users per
      // cell = a count over the tf aggregate. No join, no distinct passes.
      // The eager localCheckpoint pins that: tf/df/N all read the
      // materialized (user, cell) aggregate — bounded, far smaller than
      // points — so the lineitem⋈orders subtree runs ONCE (betting on
      // ReuseExchange left it evaluated in three branches, r6 plan dump);
      // blocks free with the frame, unlike a session-lifetime persist.
      val termFreq = pointsCells.groupBy($"user_id", $"cell").agg(sum(lit(1)).as("tf"))
        .localCheckpoint(true)
      val docFreq = termFreq.groupBy($"cell").agg(sum(lit(1)).as("df"))
      // broadcast scalar N, J6 (01_geofraud_clustering.py:409) — folded into
      // the plan as a broadcast 1-row cross join instead of a driver-side
      // count action, so the docFreq tree is computed once, not twice
      val nDf = docFreq.agg(count(lit(1)).cast("double").as("__n"))
      termFreq.join(docFreq, Seq("cell"))
        .crossJoin(broadcast(nDf))
        .withColumn("tf_idf", round($"tf" * log($"__n" / $"df"), 6))
        .select($"user_id", $"cell", $"tf", $"df", $"tf_idf")
        .orderBy($"user_id", $"cell")
    }),

    // U2: generator/explode (01_geofraud_clustering.py:191)
    "q17_explode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").filter($"l_orderkey" < 100)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_list($"l_linenumber")).as("lns"))
        .select($"l_orderkey", explode($"lns").as("ln"))
        .orderBy($"l_orderkey", $"ln")
    }),

    // A11: exact quantiles (reference choropleth bins,
    // 01_geofraud_clustering.py:456)
    "q18_quantile" -> ((s, dir) => {
      t(s, dir, "orders")
        .selectExpr("transform(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D)), x -> round(x, 4)) AS q")
    }),

    // P6: deterministic Bernoulli-style sample (seeded sampling replaced by a
    // reproducible key-hash filter so the oracle can replay it)
    "q19_sample_hash" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter((($"l_orderkey" * 131 + $"l_linenumber") % 97) < 10)
        .select($"l_orderkey", $"l_linenumber")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // S3/S4/S9: DDL + saveAsTable + catalog table scan round-trip (the
    // reference's database setup and Delta tiles table,
    // config/configure_notebook.py:18-27, 01_geofraud_clustering.py:431).
    // Contents are a deterministic orders subset, so the oracle replays the
    // subset from the source table — no warehouse path coupling.
    "q26_table_roundtrip" -> ((s, dir) => {
      import s.implicits._
      s.sql("CREATE DATABASE IF NOT EXISTS graft_bench")
      s.sql("DROP TABLE IF EXISTS graft_bench.t_orders_p")
      // a previous JVM's managed-table files outlive its ephemeral
      // metastore; clear the leftover location or saveAsTable refuses
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + "/graft_bench.db/t_orders_p")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      t(s, dir, "orders").filter($"o_orderstatus" === "P")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .write.mode("overwrite").format("parquet")
        .saveAsTable("graft_bench.t_orders_p")
      s.table("graft_bench.t_orders_p").orderBy($"o_orderkey")
    }),

    // S3/S4 + J1 at 100 TB: BUCKETED co-located join — both sides written
    // bucketBy(8) on the join key, so the big-table join plans with ZERO
    // shuffle exchanges (asserted in PlanAuditSpec): pay the layout once at
    // write time, every later join of these tables is exchange-free. The
    // plain-parquet analog of the reference's Delta OPTIMIZE ZORDER
    // layout-for-access pattern (01_geofraud_clustering.py:440).
    "q60_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      s.sql("CREATE DATABASE IF NOT EXISTS graft_bench")
      Seq("t_orders_b", "t_customer_b").foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS graft_bench.$tbl")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/graft_bench.db/$tbl")
        loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      }
      t(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .write.format("parquet").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_bench.t_orders_b")
      t(s, dir, "customer").select($"c_custkey", $"c_acctbal")
        .write.format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_bench.t_customer_b")
      s.table("graft_bench.t_orders_b")
        .join(s.table("graft_bench.t_customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey")
        .agg(count(lit(1)).as("n_orders"), max($"o_totalprice").as("max_price"))
        .orderBy($"c_custkey")
    }),

    // the SQL ENTRY surface end-to-end: temp view + spark.sql text + the
    // extension-injected native geo_cell function (GraftExtensions) — a
    // SQL-only consumer's path through the library, same result as q14's
    // DataFrame spelling
    "q65_sql_surface" -> ((s, dir) => {
      Tables.points(s, dir).createOrReplaceTempView("graft_points")
      s.sql("""SELECT geo_cell(latitude, longitude, 9) AS cell, count(1) AS cnt
              |FROM graft_points GROUP BY cell ORDER BY cell""".stripMargin)
    }),

    // pivot (wide reshaping): order counts per priority × status. Explicit
    // pivot values keep the plan a single pass (no distinct-values job) —
    // the form that scales; absent combos are 0 not null on both engines.
    "q62_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("f_cnt"),
          coalesce($"O", lit(0L)).as("o_cnt"),
          coalesce($"P", lit(0L)).as("p_cnt"))
        .orderBy($"o_orderpriority")
    }),

    // S1/S5: CSV sink + scan round-trip with explicit schema (the reference's
    // CSV ingestion, 01_geofraud_clustering.py:56-62, without the pandas hop)
    "q20_csv_roundtrip" -> ((s, dir) => {
      import s.implicits._
      // fixed path + overwrite (not createTempDirectory): repeated
      // Verify/Bench runs reuse one scratch dir instead of leaking
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_q20_csv").toString
      t(s, dir, "region").write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("r_regionkey INT, r_name STRING").option("header", "true").csv(tmp)
        .orderBy($"r_regionkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      "SELECT o_orderkey, o_totalprice, 1 AS one FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 100",
    "q02_groupby_count" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q03_groupby_sum_lit" ->
      "SELECT l_linestatus, CAST(sum(1) AS BIGINT) AS tf FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus",
    "q04_groupby_max" ->
      "SELECT l_returnflag, max(l_extendedprice) AS max_price FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q05_collect_list" ->
      "SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lns FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey ORDER BY l_orderkey",
    "q06_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q07_global_count" ->
      "SELECT count(*) AS n FROM lineitem",
    "q08_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "q09_join_inner_agg" ->
      "SELECT p_brand, count(*) AS cnt, sum(l_quantity) AS sum_qty FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand",
    "q10_join_composite" ->
      """WITH m AS (SELECT l_orderkey, max(l_linenumber) AS l_linenumber FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem JOIN m USING (l_orderkey, l_linenumber) ORDER BY l_orderkey""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0) o ON c_custkey = o_custkey
        |WHERE o_custkey IS NULL ORDER BY c_custkey""".stripMargin,
    "q12_leftouter_isnull" ->
      """SELECT c_custkey FROM customer
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0) o ON c_custkey = o_custkey
        |WHERE o_custkey IS NULL ORDER BY c_custkey""".stripMargin,
    "q13_broadcast_join" ->
      """SELECT n_name, count(*) AS cnt FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q14_geo_cell" ->
      s"""WITH ${Tables.pointsSql}
         |SELECT ${Tables.cellSql("latitude", "longitude", 9)} AS cell, count(*) AS cnt
         |FROM points GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_haversine" ->
      s"""WITH ${Tables.pointsSql}
         |SELECT count(*) AS n FROM points
         |WHERE ${Tables.haversineSql("latitude", "longitude", "40.73", "-73.98")} <= 3000.0""".stripMargin,
    "q16_tfidf" ->
      s"""WITH ${Tables.pointsSql},
         |pc AS (SELECT user_id, ${Tables.cellSql("latitude", "longitude", 9)} AS cell FROM points),
         |tiles AS (SELECT DISTINCT user_id, cell FROM pc),
         |df AS (SELECT cell, CAST(sum(1) AS BIGINT) AS df FROM
         |  (SELECT DISTINCT pc.user_id, t.cell FROM (SELECT DISTINCT cell FROM tiles) t JOIN pc USING (cell))
         |  GROUP BY cell),
         |tf AS (SELECT user_id, cell, CAST(sum(1) AS BIGINT) AS tf FROM tiles JOIN pc USING (cell, user_id) GROUP BY user_id, cell),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM df)
         |SELECT tf.user_id, tf.cell, tf.tf, df.df, round(tf.tf * ln(n.n / df.df), 6) AS tf_idf
         |FROM tf JOIN df USING (cell) CROSS JOIN n
         |ORDER BY tf.user_id, tf.cell""".stripMargin,
    "q17_explode" ->
      """WITH a AS (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey)
        |SELECT l_orderkey, unnest(lns) AS ln FROM a ORDER BY l_orderkey, ln""".stripMargin,
    "q18_quantile" ->
      "SELECT list_transform(quantile_cont(o_totalprice, [0.25, 0.5, 0.75]), x -> round(x, 4)) AS q FROM orders",
    "q19_sample_hash" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE (l_orderkey * 131 + l_linenumber) % 97 < 10 ORDER BY l_orderkey, l_linenumber",
    "q20_csv_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q26_table_roundtrip" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'P' ORDER BY o_orderkey",
    "q60_bucketed_join" ->
      """SELECT c_custkey, count(*) AS n_orders, max(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q65_sql_surface" ->
      s"""WITH ${Tables.pointsSql}
         |SELECT ${Tables.cellSql("latitude", "longitude", 9)} AS cell, count(*) AS cnt
         |FROM points GROUP BY 1 ORDER BY 1""".stripMargin,
    "q62_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
