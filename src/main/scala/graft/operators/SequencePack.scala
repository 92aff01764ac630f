package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the LLM-training-pipeline step
  * that turns a corpus of variable-length documents into fixed-length
  * training sequences: documents are laid out in one deterministic
  * global order and the concatenation is cut every `seqLen` tokens,
  * documents SPLITTING across cuts (the GPT-style packing that wastes
  * zero budget, vs. first-fit binning that strands tail capacity and
  * is inherently sequential).
  *
  * Determinism discipline: the layout order is the engine's md5
  * shuffle (`md5(doc_id ':' salt)`, ties by doc_id) — a seeded,
  * engine-replayable permutation, not input order; every offset is
  * integer arithmetic off ONE global running total, so the entire
  * packing replays bit-for-bit anywhere.
  *
  * Scale shape (100 TB corpus): one [[PrefixSum.runningTotal]] range
  * exchange over the (md5, id)-ordered lengths — never a global sort
  * of text, never a driver loop over documents (first-fit's fatal
  * flaw) — then a map-only `sequence`+`explode` emitting each
  * document's ≤ len/seqLen + 2 bin segments. Text itself never
  * moves: the output is an OFFSET PLAN (doc_id, seq_id, offsets) the
  * tokenize-and-gather stage joins back on doc_id.
  */
object SequencePack {

  /** The packing plan: `(doc_id, seq_id, seg_offset, doc_offset,
    * seg_len)` — segment `[doc_offset, doc_offset+seg_len)` of the
    * document lands at `[seg_offset, seg_offset+seg_len)` of training
    * sequence `seq_id`. Zero-length documents are excluded. Every
    * sequence except the last is exactly `seqLen` full.
    *
    * @param len    integer token/char length column
    * @param seqLen training sequence length, >= 1
    */
  def pack(
      df: DataFrame, docId: Column, len: Column, seqLen: Long,
      salt: String = "pack"): DataFrame = {
    require(seqLen >= 1L, s"seqLen must be >= 1, got $seqLen")
    val L = lit(seqLen)
    val d = df.select(docId.as("doc_id"), len.cast("long").as("len"))
      .filter(col("len") > 0L)
      .withColumn("ord",
        md5(concat(col("doc_id").cast("string"), lit(s":$salt"))))
    val cum = PrefixSum.runningTotal(d,
      Seq(col("ord"), col("doc_id")), col("len"), out = "cum")
    cum
      .withColumn("start", col("cum") - col("len"))
      .withColumn("bin", explode(sequence(
        expr("start div " + seqLen), expr("(cum - 1) div " + seqLen))))
      .select(col("doc_id"), col("bin").as("seq_id"),
        (greatest(col("start"), col("bin") * L) - col("bin") * L)
          .as("seg_offset"),
        greatest(lit(0L), col("bin") * L - col("start"))
          .as("doc_offset"),
        (least(col("cum"), (col("bin") + 1) * L) -
          greatest(col("start"), col("bin") * L)).as("seg_len"))
  }
}
