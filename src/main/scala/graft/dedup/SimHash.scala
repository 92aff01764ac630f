package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (Charikar 2002, public):
  * each token votes ±1 on every bit of its 64-bit hash; the document
  * fingerprint takes the sign of each bit's vote sum. Documents within
  * Hamming distance `maxHamming` are near-duplicates.
  *
  * Implementation is one explode + one hash aggregation with 64 codegen'd
  * sum columns — no UDFs. Pair search uses the pigeonhole block trick: a
  * 64-bit fingerprint split into `maxHamming + 1` blocks; near pairs must
  * agree exactly on ≥1 block, so candidates come from equi-joins on
  * (block index, block value) — never all-pairs, the property that matters
  * at corpus scale.
  */
object SimHash {

  /** Cross-engine-reproducible 62-bit token hash: two 31-bit polynomial
    * rolls over the token's code points (bases 31 and 37, Mersenne 2^31-1
    * modulus) packed side by side. Every step is plain integer arithmetic
    * a differential oracle can replay in ANSI SQL — unlike xxhash64 — at
    * the cost of an interpreted higher-order fold, so it is the
    * VERIFICATION hash; [[fingerprints]] defaults to codegen'd xxhash64
    * for production runs. */
  def polyHash62(tok: Column): Column = {
    def roll(base: Int): Column = aggregate(
      sequence(lit(1), length(tok)), lit(0L),
      (acc, i) => (acc * base + ascii(substring(tok, i, lit(1)))) % 2147483647L)
    roll(31) + shiftleft(roll(37), 31)
  }

  /** Per-document fingerprint as a long column `simhash`: each token votes
    * ±1 on each of `bits` bits of its hash; the fingerprint takes the
    * vote signs.
    *
    * `hashDistinct` evaluates the hash once per DISTINCT token and joins
    * it back — worth it when the hash is expensive (the interpreted
    * polyHash62 fold) and the vocabulary is much smaller than the token
    * stream, which is exactly the 100 TB corpus shape; pointless overhead
    * for codegen'd xxhash64, hence default off. */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column = xxhash64(_), bits: Int = 64,
      hashDistinct: Boolean = false): DataFrame = {
    val raw = docs.select(col(idCol),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val toks =
      if (hashDistinct) {
        val vocab = raw.select(col("tok")).distinct()
          .withColumn("h", tokenHash(col("tok")))
        raw.join(vocab, Seq("tok"))
      } else raw.withColumn("h", tokenHash(col("tok")))
    val votes = (0 until bits).map { i =>
      // bit i set → +1 else -1
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v_$i")
    }
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val fp = (0 until bits).map { i =>
      when(col(s"v_$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), fp.as("simhash"))
  }

  private def popcount(c: Column): Column = bit_count(c)

  /** Near-dup pairs with Hamming distance <= maxHamming via pigeonhole
    * blocking on fingerprint chunks: a pair within the bound MUST agree
    * exactly on at least one of maxHamming+1 blocks, so recall is total —
    * blocking changes cost, never results (when `maxBlockSize` is unset).
    *
    * `maxBlockSize` is the skew guard for the 100 TB regime: a degenerate
    * block value shared by k documents (short or boilerplate docs piling
    * onto the same 16 bits) contributes k² candidate pairs, the one
    * super-linear term in the plan. Capping drops blocks larger than the
    * bound BEFORE the self-join — the same trade MinHash.candidates makes
    * with maxBucketSize: a pair is lost only if EVERY block it agrees on
    * is oversized, and cost becomes O(blocks × cap²) worst-case per block
    * value. The exact (uncapped) form stays the oracled path (q47). */
  def nearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      tokenHash: Column => Column = xxhash64(_), totalBits: Int = 64,
      hashDistinct: Boolean = false,
      maxBlockSize: Option[Int] = None): DataFrame =
    pairsOfFingerprints(
      fingerprints(docs, idCol, textCol, tokenHash, totalBits,
        hashDistinct),
      idCol, maxHamming, totalBits, maxBlockSize)

  /** The pigeonhole block join over an existing `(idCol, simhash)`
    * frame — the pair-search half of [[nearDuplicates]], reusable over
    * any fingerprint set (in particular [[componentEdges]]'s DISTINCT
    * fingerprints). */
  def pairsOfFingerprints(
      fps: DataFrame, idCol: String, maxHamming: Int,
      totalBits: Int = 64,
      maxBlockSize: Option[Int] = None): DataFrame = {
    val blocks = maxHamming + 1
    val bits = totalBits / blocks
    val chunks = (0 until blocks).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), b * bits)
          .bitwiseAND((1L << bits) - 1).as("bv"))
    }
    val keyedAll = fps.select(col(idCol), col("simhash"),
        explode(array(chunks: _*)).as("c"))
      .select(col(idCol), col("simhash"),
        col("c.blk").as("blk"), col("c.bv").as("bv"))
    val keyed = maxBlockSize match {
      case Some(cap) =>
        val sizes = keyedAll.groupBy(col("blk"), col("bv"))
          .agg(count(lit(1)).as("block_n"))
        keyedAll.join(sizes.filter(col("block_n") <= cap), Seq("blk", "bv"))
          .drop("block_n")
      case None => keyedAll
    }
    val a = keyed.select(col(idCol).as("id_a"),
      col("simhash").as("sh_a"), col("blk"), col("bv"))
    val b = keyed.select(col(idCol).as("id_b"),
      col("simhash").as("sh_b"), col("blk"), col("bv"))
    // hamming BEFORE distinct: the popcount is a per-row map over the
    // streaming join output, so filtering first means the distinct's
    // hash state holds only genuine near-dup pairs — not every
    // block-collision pair (the 4 GiB probe's q145 working set); the
    // result is identical because hamming is a pure function of the pair
    a.join(b, Seq("blk", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        popcount(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connectivity-sufficient near-dup edge set `(id_a, id_b)` — EXACTLY
    * the connected components of [[nearDuplicates]]' full pair set, with
    * quadratically fewer edges. Two exact facts make the collapse safe:
    * hamming distance is a pure function of the FINGERPRINTS, so
    * (1) docs sharing a fingerprint are pairwise near-dups (distance 0)
    * — a star from the group's min id carries identical connectivity to
    * the group's clique — and (2) if ANY member of fingerprint group A
    * pairs with ANY member of group B, every cross pair holds, so ONE
    * representative edge carries the A↔B connectivity. The edge set is
    * therefore (rep, member) stars within identical-fingerprint groups
    * plus the block join over DISTINCT fingerprints only.
    *
    * This is the clustering-scale fix for dup-heavy corpora: a
    * duplicate family of s docs contributes s−1 star edges instead of
    * s(s−1)/2 pairs, and the block self-join's n² term shrinks from
    * docs-per-block to distinct-fingerprints-per-block. Measured at the
    * 30× ScaleUp corpus (150k docs): 108.5M pairs → the star+rep form
    * (SCALE.md round 8). Use for [[graft.dedup.Clusters]] component
    * work (q145/q148); [[nearDuplicates]] remains the per-pair listing
    * (q47's contract, where every pair IS the answer). */
  def componentEdges(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      tokenHash: Column => Column = xxhash64(_), totalBits: Int = 64,
      hashDistinct: Boolean = false,
      maxBlockSize: Option[Int] = None): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, tokenHash, totalBits,
        hashDistinct)
      .transform(graft.core.Pin.apply)
    val groups = fps.groupBy(col("simhash")).agg(min(col(idCol)).as("rep"))
      .transform(graft.core.Pin.apply)
    val intra = fps.join(groups, Seq("simhash"))
      .filter(col(idCol) =!= col("rep"))
      .select(col("rep").as("id_a"), col(idCol).as("id_b"))
    val cross = pairsOfFingerprints(
        groups.select(col("rep").as(idCol), col("simhash")),
        idCol, maxHamming, totalBits, maxBlockSize)
      .select(col("id_a"), col("id_b"))
    intra.unionByName(cross)
  }
}
