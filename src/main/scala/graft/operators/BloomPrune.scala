package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Explicit runtime-filter (bloom) join pruning — the standard 100 TB
  * shuffle reducer for fact ⋈ selective-dim joins.
  *
  * Shape: build a bloom filter over the dim side's join keys (a
  * distributed `treeAggregate` of mergeable partials via
  * `DataFrameStatFunctions.bloomFilter` — the sketch, a few MB, is the
  * only thing collected, exactly like a broadcast variable), then filter
  * the fact side with the codegen'd
  * [[graft.functions.LongBloomMightContain]] probe BEFORE the join's
  * shuffle. False positives are eliminated by the exact join that
  * follows, so results are identical to the un-pruned join; what changes
  * is that ~(1 - selectivity) of the fact rows never enter the exchange.
  *
  * When the dim side is small enough to broadcast, the bloom adds
  * nothing — a BroadcastHashJoin already avoids shuffling the fact. The
  * operator's value is the middle regime: a dim too large to broadcast
  * (forcing a shuffle join of both sides) but still far more selective
  * than the fact — at 100 TB, a 50 GB filtered dim against a 100 TB fact
  * shuffles 100 TB without the bloom and ~selectivity × 100 TB with it,
  * for a filter costing a few MB per executor. Spark's
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` injects the
  * same rewrite when catalog stats justify it; the explicit operator is
  * deterministic, works on fresh un-analyzed data, and composes with the
  * engine's other pre-shuffle reductions (reference context: every
  * incremental stat joins a listens fact against a filtered metadata cache,
  * listenbrainz_spark/stats/incremental/user/entity.py:37-59).
  *
  * Cost model callers should know (and budget for):
  *   - The dim plan is evaluated ONCE for the bloom build (plus one extra
  *     `count()` pass when `expectedItems` is None), and typically AGAIN
  *     by the caller's exact join — when the dim subtree is expensive,
  *     `dim.persist()` before calling turns both into cache reads.
  *   - [[antiJoinLong]]/[[antiJoinString]] evaluate the fact SCAN (and
  *     the bloom probe) twice — once per branch of the miss/candidate
  *     split. That trade is right when the join's exchange dominates a
  *     columnar re-scan (the 100 TB fact regime this operator targets);
  *     when the fact itself is expensive to produce (not a bare scan),
  *     either persist it or prefer the plain `left_anti` join.
  *
  * `expectedItems` sizes the filter; callers that already know the dim
  * cardinality (a just-counted aggregate, catalog stats) should pass it —
  * `pruneLong` otherwise spends one extra dim pass on `count()`, which is
  * still cheap relative to the fact shuffle it saves.
  */
object BloomPrune {

  /** Serialized bloom filter over `dim(dimKey)` (long keys). */
  def bloomBytesLong(
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(dimKey, math.max(expectedItems, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `fact` reduced to rows whose `factKey` MIGHT appear in `dim(dimKey)`.
    * Sound for a subsequent inner/semi join (no false negatives: every
    * matching row survives); false positives are removed by the exact
    * join. Null keys are dropped — they cannot equi-join match.
    */
  def pruneLong(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val n = expectedItems.getOrElse(dim.count())
    val bytes = bloomBytesLong(dim, dimKey, n, fpp)
    GraftFunctions.register(fact.sparkSession)
    fact.filter(GraftFunctions.bloomContains(col(factKey), lit(bytes)))
  }

  /** String-keyed [[pruneLong]]: both sides are hashed to 8-byte
    * `xxhash64` keys and the LONG bloom machinery is reused unchanged —
    * the probe stays the codegen'd [[graft.functions.LongBloomMightContain]]
    * and the filter never stores variable-length strings. The hash is
    * deterministic and applied identically on both sides, so there are
    * still no false negatives (a matching string always hashes to a
    * present long); hash collisions only add to the false-positive rate
    * (≤ n²/2⁶⁴ on top of `fpp` — immaterial at any realistic dim
    * cardinality), and false positives are removed by the exact join
    * that follows. This is the reference's join-key regime: listen
    * facts prune against string `recording_mbid`/user-id sets
    * (listenbrainz_spark/listens/data.py:73-75 anti-join keys).
    */
  def pruneString(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val n = expectedItems.getOrElse(dim.count())
    val hashedDim = dim.select(xxhash64(col(dimKey)).as("__graft_hk"))
    val bytes = bloomBytesLong(hashedDim, "__graft_hk", n, fpp)
    GraftFunctions.register(fact.sparkSession)
    fact.filter(
      GraftFunctions.bloomContains(xxhash64(col(factKey)), lit(bytes)))
  }

  /** Bloom-accelerated LEFT ANTI join on a long key.
    *
    * The dual of [[pruneLong]]: a key the bloom says is ABSENT is
    * guaranteed non-matching (no false negatives), so those fact rows —
    * the vast majority when the dim is selective — pass the anti join
    * directly WITHOUT entering the shuffle. Only might-contain rows
    * (true matches + fpp false positives) take the exact anti join to
    * settle membership. Null fact keys never equi-match, so they are
    * definite misses and also skip the shuffle — matching Spark's
    * LeftAnti null semantics exactly. Results are row-identical to
    * `fact.join(dim, key, "left_anti")`.
    *
    * The miss/candidate split reads the fact twice (see the object
    * scaladoc's cost model); the dim key is aliased to a fresh name
    * before the settle join, so `factKey == dimKey` is safe.
    */
  def antiJoinLong(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val n = expectedItems.getOrElse(dim.count())
    val bytes = bloomBytesLong(dim, dimKey, n, fpp)
    GraftFunctions.register(fact.sparkSession)
    antiSplit(fact,
      GraftFunctions.bloomContains(col(factKey), lit(bytes)),
      col(factKey), dim.select(col(dimKey).as("__graft_dk")))
  }

  /** String-keyed [[antiJoinLong]], via the same xxhash64-to-long
    * reduction as [[pruneString]]. The bloom verdict is computed on the
    * hash (no false negatives — identical deterministic hash on both
    * sides); the settle join compares the STRINGS, so hash collisions
    * cannot leak a wrong row. Row-identical to
    * `fact.join(dim, key, "left_anti")`.
    */
  def antiJoinString(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val n = expectedItems.getOrElse(dim.count())
    val hashedDim = dim.select(xxhash64(col(dimKey)).as("__graft_hk"))
    val bytes = bloomBytesLong(hashedDim, "__graft_hk", n, fpp)
    GraftFunctions.register(fact.sparkSession)
    antiSplit(fact,
      GraftFunctions.bloomContains(xxhash64(col(factKey)), lit(bytes)),
      col(factKey), dim.select(col(dimKey).as("__graft_dk")))
  }

  /** Shared miss/candidate split: definite misses (null key, or bloom
    * says absent) bypass the shuffle; candidates settle via the exact
    * anti join against the aliased dim key. */
  private def antiSplit(
      fact: DataFrame, might: Column,
      factKey: Column, dimAliased: DataFrame): DataFrame = {
    val definiteMiss = fact.filter(factKey.isNull || !might)
    val candidates = fact.filter(factKey.isNotNull && might)
    val settled = candidates.join(
      dimAliased, factKey === col("__graft_dk"), "left_anti")
    definiteMiss.unionByName(settled)
  }
}
