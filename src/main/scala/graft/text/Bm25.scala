package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the scoring complement of
  * [[InvertedIndex]]: Okapi BM25 with the Lucene always-positive idf
  * (`ln(1 + (N - df + 0.5)/(df + 0.5))`), k1 = 1.2, b = 0.75.
  *
  * Scale shape: one explode restricted to the query terms (the `isin`
  * pushes into the scan, so the shuffle carries only matching (doc, term)
  * pairs — query terms are few by construction), document frequencies are
  * a bounded per-term aggregate, and corpus stats (N, avgdl) ride a
  * broadcast single-row frame — no driver hop, no full-corpus shuffle.
  *
  * Cross-engine determinism (the driver's hash gate): every per-term score
  * is computed with a PINNED left-to-right operation order, rounded to
  * integer micro-units, and the per-doc total is an INTEGER sum — order
  * independent, so Spark's aggregation order vs the oracle's cannot
  * diverge. The one `ln` per (term, df) follows the q16 tf-idf precedent.
  * [[scoreSql]] is the operand-for-operand DuckDB twin. */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-`k` docs for `terms`: (doc_id, n_terms_hit, score_micros, rank).
    * Docs containing no query term are excluded (standard retrieval). */
  def topK(docs: DataFrame, terms: Seq[String], k: Int = 15,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "topK: at least one query term")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(lower(col(textCol))).as("tk"))
    // checkpointed: the corpus-stats aggregate AND the tf explode both
    // consume dl — un-materialized, the scan + tokenize regex ran twice
    // per query (the q16/q131 share-the-scan rule)
    val dl = toks.select($"doc_id", size($"tk").as("dl"), $"tk")
      .localCheckpoint(true)
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
      .select($"n_docs",
        ($"sum_dl".cast("double") / $"n_docs".cast("double")).as("avgdl"))
    val tf = dl.select($"doc_id", $"dl", explode($"tk").as("term"))
      .where($"term".isin(terms: _*))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    // pinned order, operand-for-operand with scoreSql:
    //   idf  = ln(1.0 + (N - df + 0.5) / (df + 0.5))
    //   num  = tf * (k1 + 1)
    //   den  = tf + k1 * ((1 - b) + b * (dl / avgdl))
    //   term_micros = round(idf * (num / den) * 1e6)
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + ($"n_docs".cast("double") - $"df".cast("double") + lit(0.5))
          / ($"df".cast("double") + lit(0.5))))
      .withColumn("term_micros",
        round($"idf" * (($"tf".cast("double") * lit(K1 + 1.0))
            / ($"tf".cast("double")
              + lit(K1) * (lit(1.0 - B) + lit(B) * ($"dl".cast("double") / $"avgdl"))))
          * lit(1e6)).cast("long"))
    // top-k FIRST via orderBy+limit (plans as TakeOrderedAndProject —
    // per-partition heaps, no global sort), so the rank window runs over
    // at most k rows instead of every matching doc
    scored.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum($"term_micros").as("score_micros"))
      .orderBy($"score_micros".desc, $"doc_id").limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"score_micros".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"n_terms_hit", $"score_micros", $"rank")
      .orderBy($"rank")
  }

  /** DuckDB twin of [[topK]] over `table` — same tokenization
    * (whitespace split, empties dropped), same pinned arithmetic. */
  def scoreSql(table: String, terms: Seq[String], k: Int = 15): String = {
    // SQL string literals: double any single quote — a term like "don't"
    // must not break (or inject into) the oracle query
    val termList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), t -> t != '') AS tk
       |  FROM $table),
       |dl AS (SELECT doc_id, len(tk) AS dl, tk FROM tk),
       |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl)
       |  WHERE term IN ($termList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT tf.doc_id,
       |    CAST(round(ln(1.0 + (CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
       |        / (CAST(d.df AS DOUBLE) + 0.5))
       |      * ((CAST(tf.tf AS DOUBLE) * ${K1 + 1.0})
       |        / (CAST(tf.tf AS DOUBLE)
       |          + $K1 * (${1.0 - B} + $B * (CAST(tf.dl AS DOUBLE) / c.avgdl))))
       |      * 1e6) AS BIGINT) AS term_micros
       |  FROM tf JOIN dfreq d USING (term) CROSS JOIN corpus c),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       |    CAST(sum(term_micros) AS BIGINT) AS score_micros
       |  FROM scored GROUP BY 1),
       |r AS (SELECT doc_id, n_terms_hit, score_micros,
       |    row_number() OVER (ORDER BY score_micros DESC, doc_id) AS rank FROM agg)
       |SELECT doc_id, n_terms_hit, score_micros, rank FROM r
       |WHERE rank <= $k ORDER BY rank""".stripMargin
  }
}
