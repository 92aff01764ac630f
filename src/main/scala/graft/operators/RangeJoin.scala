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

  def byBins(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      ptCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin",
      floor(col(ptCol) / lit(binWidth)).cast("long"))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(col(startCol) / lit(binWidth)).cast("long"),
      floor(col(endCol) / lit(binWidth)).cast("long"))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
