package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-passage masking over ROLLING token windows — the
  * "deduplicate any exact substring of ≥ k tokens" corpus-hygiene pass
  * (the technique popularized by Lee et al., "Deduplicating Training
  * Data Makes Language Models Better": suffix-array exact-substring
  * dedup, re-expressed as a rolling k-gram discipline that Spark — and
  * the SQL oracle — can replay). [[graft.dedup.SegmentDedup]] covers
  * NON-overlapping fixed spans, which lets a duplicated passage
  * straddling a span boundary escape; here every token position starts
  * a k-gram, so any verbatim repeat of length ≥ k is caught wherever it
  * sits.
  *
  * Semantics (keep-first, position-exact): a k-gram occurrence is a
  * duplicate when an identical token window occurs earlier in corpus
  * order (doc id, then position). A POSITION is masked when any
  * duplicate occurrence covers it; overlapping masked windows merge
  * into maximal spans. The first occurrence of every passage survives
  * untouched — the corpus keeps one copy of each repeated passage, not
  * zero.
  *
  * Scale shape (100 TB): the only corpus-wide shuffle keys on the
  * k-gram's md5 (8-byte-ish keys, uniform; each hash group holds one
  * passage's OCCURRENCES — duplicate multiplicity, never corpus size).
  * Cover-position expansion is k-bounded map-side fan-out of duplicate
  * occurrences only; span merge and reassembly shuffle per-document
  * rows, bounded by document length. No similarity join, no candidate
  * blow-up — like SegmentDedup this is the cheap exact pass before the
  * quadratic-risk near-dup stages, but boundary-proof.
  */
object RepeatedSpans {

  /** Per input document: `n_tokens` (whitespace tokens), `n_masked`
    * (positions covered by duplicate k-grams), `n_spans` (maximal
    * merged masked spans), and `kept_text` (tokens outside every
    * masked span, joined by single spaces — note the token-rejoined
    * form, so runs of whitespace in the input normalize). Documents
    * with nothing masked pass through with n_masked = n_spans = 0. */
  def mask(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(col(textCol), " "), t => t =!= "").as("toks"))
    // every rolling k-gram, 1-based start position. The CASE guards the
    // short-doc case: Spark's sequence(1, 0) yields a DESCENDING [1, 0],
    // not an empty array
    val grams = toks
      .select(col("doc_id"), posexplode(expr(
        s"transform(CASE WHEN size(toks) >= $k THEN " +
          s"sequence(1, size(toks) - $k + 1) " +
          "ELSE cast(array() AS array<int>) END, " +
          s"i -> md5(array_join(slice(toks, i, $k), ' ')))")))
      .select(col("doc_id"), (col("pos") + 1).as("gpos"),
        col("col").as("gh"))
    // keep-first: corpus-order rank within each gram hash. Keying on
    // md5 instead of the k-token string keeps the shuffle narrow; a
    // collision would need 2^64+ grams to be likely and only ever
    // over-masks one window.
    val dup = grams
      .withColumn("occ", row_number().over(
        Window.partitionBy(col("gh"))
          .orderBy(col("doc_id"), col("gpos"))))
      .filter(col("occ") > 1)
      .select(col("doc_id"), col("gpos"))
    // positions covered by any duplicate occurrence (k-bounded fan-out)
    val cover = dup
      .select(col("doc_id"),
        explode(sequence(col("gpos"), col("gpos") + lit(k - 1)))
          .as("pos"))
      .distinct()
    // maximal spans: contiguous masked positions share pos - rank
    val spans = cover
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("span_end"))
    val perDocMask = cover.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_masked"))
    val perDocSpans = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"))
    // reassembly: tokens at unmasked positions, position order
    val kept = toks
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col").as("tok"))
      .join(cover, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("kept_text"))
    toks.select(col("doc_id"), size(col("toks")).cast("long")
        .as("n_tokens"))
      .join(perDocMask, Seq("doc_id"), "left")
      .join(perDocSpans, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
