package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary induction and out-of-vocabulary scoring — the
  * tokenizer-design feedback loop: build the top-N word vocabulary from
  * the corpus itself, then score every document by how much of it the
  * vocabulary covers. High-OOV documents are the ones a fixed tokenizer
  * will fragment into byte fallbacks (noise, wrong language, encoding
  * damage), so OOV rate doubles as a cheap quality filter.
  *
  * Scale shape (100 TB): the count is one map-side-combinable word
  * aggregate (partial counts per partition, one uniform shuffle on the
  * word); the top-N cut is a global `orderBy(…).limit(N)` — Spark plans
  * TakeOrderedAndProject, so each partition forwards at most N rows and
  * the driver holds exactly N. Scoring then BROADCASTS the vocabulary
  * (config-sized: N entries) and left-joins the exploded token stream
  * against it — the corpus itself is never shuffled to be scored.
  * Deterministic: count ties break on the word itself, so the vocabulary
  * is a pure function of the corpus.
  */
object Vocabulary {

  /** Top-`n` words by corpus frequency: `(word, n_occurrences, rank)`,
    * rank 1-based, ties broken lexicographically. */
  def build(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    docs.select(explode(filter(split(col(textCol), " "), t => t =!= ""))
        .as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word"))
      .limit(n)
      // rank over the N surviving rows only — the window sees the
      // vocabulary, never the corpus.
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occurrences").desc, col("word"))))
  }

  /** Per-document OOV statistics against `vocab` (a [[build]] result or
    * any one-column-`word` frame): token count, OOV token count, and the
    * OOV rate as exact bigint/bigint division. `vocab` is broadcast. */
  def oovStats(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val reserved = Seq("n_tokens", "n_oov", "oov_rate")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before scoring")
    val v = broadcast(vocab.select(col("word"), lit(1).as("__in_vocab")))
    docs.select(col(idCol),
        explode(filter(split(col(textCol), " "), t => t =!= ""))
          .as("word"))
      .join(v, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov") / col("n_tokens"))
  }
}
