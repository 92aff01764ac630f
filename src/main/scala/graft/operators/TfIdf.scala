package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the corpus-statistical summarizer of the
  * text-analysis family: each document's top-k terms by term frequency ×
  * inverse document frequency, the standard first-pass signal for topic
  * tagging, near-dup triage beyond verbatim text, and retrieval-index
  * construction over a training corpus.
  *
  * Exactness discipline (the q174 rule): no log-space idf — the score is
  * the RATIONAL `tf × N / df` (idf as a plain ratio, monotone in the
  * log formulation for fixed tf ordering purposes within a document
  * set): `tf × N` is an exact bigint product, the single division is
  * one IEEE double op, so Spark and any SQL engine agree bit-for-bit
  * and the ranking needs no tolerance. Classic log-idf compresses the
  * range but does not change which terms are rare; for a top-k cut the
  * rational form ranks identically per document when tf ties are broken
  * by term, and it is what makes the operator oracle-able.
  *
  * Scale shape (100 TB): one (doc, term) aggregation with map-side
  * combine (the exchange is bounded by distinct (doc, term) pairs, the
  * same bound any tokenizer pays), one term-keyed df aggregation
  * (bounded by VOCABULARY, with map-side partials — tiny relative to
  * the corpus), and a term join of the two. The df table is the
  * bigram-counts shape of q174/q179/q180: string-keyed here because the
  * oracle pins exact semantics; at corpus scale the same relaxations
  * apply verbatim (xxhash64 term keys, or broadcast the df table when
  * vocabulary fits — Catalyst already broadcasts it below threshold).
  * The final top-k is a per-doc window over k·docs rows, never a global
  * sort.
  */
object TfIdf {

  /** (idCol, term, tf) — whitespace tokenization, empty tokens dropped,
    * one row per distinct (doc, term). */
  def termFrequencies(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(filter(split(col(textCol), " "), t => t =!= ""))
          .as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document top-k terms by rational TF-IDF:
    * (idCol, term, tf, df, score, term_rank), score = tf × N / df with
    * N = total document count. Ties break by term ascending — fully
    * deterministic. Documents with no tokens are absent. */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = docs.count() // one scalar to the driver, like q159's anchor
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("score", (col("tf") * lit(n)) / col("df"))
      .withColumn("term_rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("term"))))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("term_rank").cast("long").as("term_rank"))
  }
}
