package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the brief's other canonical missing operator:
  * all (point, interval) pairs with `start <= pt <= end` on the same key.
  *
  * Spark plans a raw ts-range predicate as a broadcast-nested-loop or
  * cartesian theta join — quadratic candidates per key. The scalable shape
  * is bin bucketing: points land in exactly ONE bin of width `binWidth`,
  * intervals are exploded across every bin they touch, and the join is a
  * plain equi-join on (key, bin) followed by the exact range filter.
  * Because a point has one bin, each qualifying pair is emitted exactly
  * once — no dedup pass. Candidate volume is bounded by bin occupancy ×
  * interval span, both controlled by `binWidth`: pick it near the typical
  * interval length so intervals explode into O(1) bins.
  *
  * Inputs carry micros (or any monotone long) in `ptCol` / `startCol` /
  * `endCol`; non-key column names must be disjoint between the sides.
  */
object RangeJoin {

  /** `maxBinsPerInterval` bounds the explode fan-out: an interval spanning
    * more bins than this fails the job with a descriptive error instead of
    * silently materializing an enormous (or > max-array-length) bin array —
    * the fix is a wider `binWidth`. Inverted intervals (`end < start`) are
    * empty by the range predicate, so they are dropped before the explode
    * rather than generating a descending (invalid) bin sequence. */
  def byBins(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      ptCol: String, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 1 << 20): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin",
      floor(col(ptCol) / lit(binWidth)).cast("long"))
    val lo = floor(col(startCol) / lit(binWidth)).cast("long")
    val hi = floor(col(endCol) / lit(binWidth)).cast("long")
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      // assert_true returns null when the predicate holds and raises
      // otherwise; expressed as an always-true filter so the optimizer
      // cannot prune the check away
      .filter(assert_true(hi - lo < lit(maxBinsPerInterval.toLong),
        concat(lit(s"range-join interval spans > $maxBinsPerInterval bins " +
          s"of width $binWidth — widen binWidth; interval ["),
          col(startCol), lit(", "), col(endCol), lit("]"))).isNull)
      .withColumn("__bin", explode(sequence(lo, hi)))
    p.join(i, keyCols :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
