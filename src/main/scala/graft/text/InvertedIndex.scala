package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term → posting-list index build — the retrieval-side complement of the
  * corpus operators: document frequency plus a capped, sorted posting list
  * per term.
  *
  * Scale shape: one explode of per-doc DISTINCT tokens, then a single
  * window over (term, doc_id). The window's sort-shuffle gives BOTH the
  * document frequency (unbounded-frame count) and the first-`cap` postings
  * (row_number) in one exchange, and the final per-term collect sees at
  * most `cap` rows — aggregation state stays bounded no matter how hot a
  * term is (a stopword's full posting list would otherwise be a
  * single-task OOM at 100 TB; real indexes block hot postings the same
  * way). Postings are emitted as a comma-joined string because the
  * driver's compare cannot sort array cells (q70 precedent). */
object InvertedIndex {

  def build(docs: DataFrame, postingCap: Int = 20,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = array_distinct(TextFunctions.tokens(lower(col(textCol))))
    val exploded = docs.select(col(idCol).as("doc_id"), explode(toks).as("term"))
    val byTerm = Window.partitionBy(col("term"))
    val ordered = byTerm.orderBy(col("doc_id"))
    exploded.select(col("term"), col("doc_id"),
        row_number().over(ordered).as("rn"),
        count(lit(1)).over(byTerm).as("df"))
      .where(col("rn") <= postingCap)
      .groupBy(col("term"))
      .agg(max(col("df")).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
  }
}
