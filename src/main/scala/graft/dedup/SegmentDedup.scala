package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication at segment granularity — the
  * "deduplicate repeated passages, not just whole documents" pass (the
  * corpus-hygiene step popularized for LLM training corpora; whole-doc
  * exact dedup is q41, near-dup is MinHash/SimHash — this catches the
  * boilerplate BETWEEN those: license headers, navigation chrome,
  * templated paragraphs repeated verbatim across otherwise-distinct
  * documents).
  *
  * Unit: consecutive `segTokens`-token spans of the whitespace token
  * stream (the last span per document may be short). Semantics: global
  * keep-first — a span's first occurrence in corpus order
  * (`idCol`, position) survives; every later verbatim copy is dropped.
  * Surviving spans are reassembled in position order, so the output is a
  * cleaned corpus, not just a report.
  *
  * Scale shape (100 TB): two bounded shuffles. (1) keep-first ranking
  * shuffles on md5(segment) — uniform by construction, and each hash
  * group holds only the COPIES of one span (duplicate multiplicity, not
  * corpus size), so no partition is ever large; (2) reassembly shuffles
  * surviving spans back on the document id, bounded by document length.
  * No similarity join, no candidate blow-up — this is the cheap exact
  * pass that runs BEFORE the quadratic-risk near-dup stages and shrinks
  * their input.
  */
object SegmentDedup {

  /** Returns one row per input document: `n_segs` (spans before dedup),
    * `n_kept` (surviving spans), `kept_tokens` (token count after), and
    * `kept_text` (the reassembled document — empty string when every
    * span was first seen elsewhere). */
  def dedup(
      docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    val reserved = Seq("n_segs", "n_kept", "kept_tokens", "kept_text")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before deduplicating")

    val toks = docs.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("__toks"))
      .withColumn("__n", size(col("__toks")))

    // Consecutive spans (stride == width: the q142 chunker with zero
    // overlap). n == 0 yields one empty span, filtered below.
    val segs = toks.select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            floor((greatest(col("__n"), lit(1)) - 1) / segTokens)
              .cast("int")),
          i => concat_ws(" ",
            slice(col("__toks"), i * segTokens + 1, lit(segTokens))))))
      .select(col(idCol), col("pos"), col("col").as("seg"))
      .filter(col("seg") =!= "")

    // Global keep-first: rank each span's occurrences by corpus order.
    // Partitioning on the md5 of the span keeps the shuffle key fixed
    // width however long the span text is.
    val w = Window.partitionBy(md5(col("seg").cast("binary")))
      .orderBy(col(idCol), col("pos"))
    val kept = segs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    // Reassemble survivors in position order; left join keeps documents
    // that lost every span (and empty documents) with zeroed stats.
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg"))).as("kept_text"))
    toks.select(col(idCol),
        ceil(col("__n").cast("double") / segTokens).cast("long")
          .as("n_segs"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(size(filter(split(col("kept_text"), " "),
            t => t =!= "")).cast("long"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
