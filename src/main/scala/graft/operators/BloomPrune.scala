package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
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
    */
  def antiJoinLong(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val n = expectedItems.getOrElse(dim.count())
    val bytes = bloomBytesLong(dim, dimKey, n, fpp)
    GraftFunctions.register(fact.sparkSession)
    val might = GraftFunctions.bloomContains(col(factKey), lit(bytes))
    val definiteMiss = fact.filter(col(factKey).isNull || !might)
    val candidates = fact.filter(col(factKey).isNotNull && might)
    val settled = candidates.join(
      dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_anti")
    definiteMiss.unionByName(settled)
  }
}
