package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count estimation over the
  * [[graft.functions.BoundedTopKAgg]] bottom-k sketch
  * (`graft_bottom_k(item, xxhash64(item), k)`).
  *
  * The sketch retains the k smallest distinct `(hash, item)` pairs per
  * group. Mapping the 64-bit hash to u ∈ (0, 1), the k-th minimum u_k
  * of n distinct uniform draws estimates n ≈ (k−1)/u_k (Bar-Yossef et
  * al. 2002, "Counting distinct elements in a data stream"; the KMV
  * form per Beyer et al., SIGMOD'07, is unbiased with relative
  * std-error ~ 1/sqrt(k−2)). When the sketch holds FEWER than k
  * entries the group had fewer than k distinct items and the count is
  * EXACT — the regime the q233 oracle pins; KmvSpec pins the
  * estimation-error envelope of the k < n regime.
  *
  * Scale shape: state is k pairs per group regardless of group size
  * (the whole point vs exact count-distinct's full-domain shuffle);
  * sketches of disjoint scans MERGE (bottom-k of a union = bottom-k of
  * the per-part bottom-ks), and two groups' audience overlap is
  * computable from their sketches alone — no re-scan of the fact
  * table (reference: the same role its HLL popularity sketches play
  * across listenbrainz_spark/stats, but KMV additionally supports
  * intersection via the retained item ids).
  */
object Kmv {

  /** 2^64 as a double, for mapping a full-range signed 64-bit hash to
    * the unit interval: u = h / 2^64 + 0.5 ∈ (0, 1). */
  private val TwoPow64 = 1.8446744073709552e19

  /** Unit-interval position of a sketch entry's hash weight. */
  def unitPos(hash: Column): Column =
    hash.cast("double") / lit(TwoPow64) + lit(0.5)

  /** Distinct-count estimate from a `graft_bottom_k(item,
    * xxhash64(item), k)` sketch column: exact below k, (k−1)/u_k at
    * capacity. The sketch array is best-first = hash-ascending, so
    * `element_at(sk, k)` IS the k-th minimum.
    *
    * Boundary note: a sketch holding exactly k entries COULD come from a
    * group with exactly k distinct items, where k would be the exact
    * answer — but "did the sketch saturate or merely fill" is not
    * recoverable from the sketch (u_k coverage can't distinguish them),
    * so size == k is estimator territory BY DESIGN; the documented
    * contract is "exact below k". */
  def distinctEstimate(sk: Column, k: Int): Column = {
    val n = size(sk)
    when(n < k, n.cast("double"))
      .otherwise(lit(k - 1).cast("double") /
        unitPos(element_at(sk, k).getField("weight")))
  }
}
