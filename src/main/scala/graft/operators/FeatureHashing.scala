package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick featurization (Weinberger et al., ICML'09): map each
  * token to one of D buckets with a signed ±1 contribution, summing
  * collisions — the vocabulary-free path to fixed-width features.
  * Where [[Vocabulary]] builds and broadcasts an explicit token→id
  * map (a corpus pass + a K-row broadcast), feature hashing needs NO
  * corpus pass at all: bucket and sign are pure per-row functions of
  * the token, so featurization is map-only, embarrassingly parallel,
  * and new tokens at inference time land in stable buckets — the
  * property that matters when the corpus is 100 TB and the vocabulary
  * is open.
  *
  * Hash family: the engine's md5 oracle discipline (CountMin.bucket's
  * hex-substring form — replayable in any engine with md5, which is
  * what lets q236 hash-match DuckDB cell-for-cell). Bucket = first
  * `hexChars` hex chars of `md5(token ":fh")` (D = 16^hexChars, kept
  * as the hex string — an opaque stable bucket id); sign = +1 when the
  * NEXT hex char is 0-7, −1 otherwise (an independent bit, the
  * Weinberger sign hash that makes collision noise zero-mean). The
  * production swap-in is `pmod(xxhash64(tok), D)` + a second bit, per
  * the CountMin md5→xxhash64 precedent (q153 vs q218).
  *
  * Output is the sparse triple form (doc, bucket, weight): exact
  * integer weights, zero-sum collisions dropped. Densification to
  * `array<double>` is a pivot the caller owns — at training-data
  * scale the triples ARE the interchange format.
  */
object FeatureHashing {

  /** Signed-sum sparse features: one row per (doc, bucket) with
    * integer `weight` = Σ ±1 over the doc's tokens in that bucket
    * (zero sums dropped). Bounded output: ≤ min(tokens, 16^hexChars)
    * rows per doc.
    *
    * @param tokens   (docCol, tokCol) rows, one per token occurrence
    * @param hexChars bucket-id width in hex chars (D = 16^hexChars)
    */
  def hashFeatures(
      tokens: DataFrame, docCol: Column, tokCol: Column,
      hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1,8], got $hexChars")
    val digest = md5(concat(tokCol.cast("string"), lit(":fh"))
      .cast("binary"))
    val bucket = substring(digest, 1, hexChars)
    val sign = when(
      substring(digest, hexChars + 1, 1).isin(
        "0", "1", "2", "3", "4", "5", "6", "7"), 1L).otherwise(-1L)
    tokens
      .select(docCol.as("doc"), bucket.as("bucket"), sign.as("sgn"))
      .groupBy(col("doc"), col("bucket"))
      .agg(sum(col("sgn")).as("weight"))
      .filter(col("weight") =!= 0L)
  }
}
