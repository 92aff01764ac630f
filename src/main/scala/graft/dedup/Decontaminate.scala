package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-corpus hygiene operator: flag
  * training documents sharing verbatim n-grams with an evaluation set, so
  * benchmark answers don't leak into training data.
  *
  * Mechanism: word-shingle both sides (reusing [[MinHash.shingles]] — the
  * same n-k+1 sliding windows), equi-join on the shingle with the EVAL
  * side broadcast (an eval suite is config-sized next to a training
  * corpus), count distinct shared shingles per (train doc, eval doc).
  *
  * Scale: the train side is one shingle pass (no self-join, no pair
  * space); the join is broadcast, so no shuffle of the corpus ever
  * happens — the whole operator is a map-side lookup + one aggregation
  * keyed by (train, eval) doc pair, bounded by actual overlap. The
  * standard long-n-gram choice (n = 8..13 in published pipelines) makes
  * coincidental overlap vanishingly rare, so output stays tiny at any
  * corpus size.
  */
object Decontaminate {

  /** (trainIdCol, eval_doc_id, shared_ngrams) for every train×eval pair
    * sharing ≥ `minShared` distinct n-grams of length `n`. */
  def overlaps(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int, minShared: Long = 1L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val trainSh = MinHash.shingles(train, idCol, textCol, n)
    val evalSh = MinHash.shingles(eval, idCol, textCol, n)
      .select(col(idCol).as("eval_doc_id"), col("shingle"))
    trainSh.join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col(idCol), col("eval_doc_id"))
      .agg(count(lit(1)).as("shared_ngrams")) // shingles are distinct per doc
      .filter(col("shared_ngrams") >= minShared)
  }

  /** Contaminated train doc ids with their total eval overlap — the drop
    * list a corpus-cleaning pipeline consumes. */
  def dropList(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int, minShared: Long = 1L): DataFrame =
    overlaps(train, eval, idCol, textCol, n, minShared)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_docs"),
        sum(col("shared_ngrams")).as("total_shared"))
}
