package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for LLM training-data assembly: assign
  * each document to a fixed-token-budget pack so downstream tokenization
  * can concatenate pack members into near-full training sequences instead
  * of padding short documents.
  *
  * Algorithm — OFFSET packing, the parallelizable form: within a shard,
  * documents are laid end-to-end in deterministic id order; a document
  * belongs to the pack its FIRST token lands in (`floor(start / budget)`).
  * This is one running sum per shard — a window aggregation, no sequential
  * driver loop — at the cost of a bounded overflow: a pack can exceed the
  * budget by at most (longest member − 1) tokens, because only the member
  * straddling the boundary overflows. Exact first-fit packing is an
  * inherently sequential recurrence (each decision depends on the previous
  * pack's remaining room) and cannot be expressed as a distributed window;
  * offset packing is the standard streaming/scale substitute.
  *
  * Scale: `shards` bounds the window width — each shard's running sum is
  * independent, so the only shuffle is the hash partition on the shard
  * key and parallelism is `shards`-wide regardless of corpus size. At
  * 100 TB pick shards ≫ executor count; packs are globally identified by
  * (shard, pack_id), so no cross-shard coordination exists by design.
  */
object SequencePacking {

  /** Per-document pack assignment.
    *
    * @param docs      input frame
    * @param idCol     unique integral id; ordering within a shard (and so
    *                  pack membership) is deterministic in it
    * @param tokens    per-document token count expression
    * @param budget    pack token budget (> 0)
    * @param shards    number of independent packing shards (> 0)
    * @return docs + (shard, pack_id, doc_tokens); pack_id is the
    *         zero-based pack index WITHIN the shard
    */
  def pack(
      docs: DataFrame, idCol: String, tokens: Column,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val reserved = Seq("doc_tokens", "shard", "pack_id", "__start")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before packing (silent overwrite corrupts pipelines)")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("doc_tokens", tokens.cast("long"))
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("__start",
        sum(col("doc_tokens")).over(w) - col("doc_tokens"))
      .withColumn("pack_id", floor(col("__start") / budget))
      .drop("__start")
  }

  /** Pack-level rollup: one row per (shard, pack_id) with member count,
    * token total, and the id range — the manifest a sequence-assembly
    * stage consumes. */
  def manifest(
      docs: DataFrame, idCol: String, tokens: Column,
      budget: Long, shards: Int): DataFrame =
    pack(docs, idCol, tokens, budget, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
}
