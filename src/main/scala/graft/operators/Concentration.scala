package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact concentration / inequality metrics over a (unit, weight)
  * frame — how skewed is attention across items, revenue across
  * suppliers, listens across artists? The catalog-health counterpart
  * of the per-model metrics in [[Evaluation]] and [[Calibration]]:
  * a recommender whose plays concentrate on 1% of the catalog has a
  * diversity problem no AUC will show.
  *
  * All three statistics are ratio-of-bigints (one final IEEE division
  * each, bit-identical cross-engine):
  *  - **Gini** over units ranked ascending by weight (strict order,
  *    unit id as tiebreak): `G = (2·Σ i·w_i − (n+1)·S) / (n·S)`
  *  - **HHI** (Herfindahl–Hirschman): `Σ w_i² / S²`
  *  - **top-k share**: `Σ_{rank > n−k} w_i / S`
  *
  * Scale shape (100 TB of facts → vocabulary-sized units): the fact
  * pass is the caller's aggregate producing (unit, weight); here the
  * unit frame gets its global rank from [[PrefixSum.runningTotal]]'s
  * range-exchange prefix sum — NO single-partition window even when
  * units number in the billions — and everything after is one
  * map-side-combinable aggregate to a single row. The unit count `n`
  * is the only driver-side scalar (one long).
  *
  * Integer envelope: exact while `Σ i·w` and `Σ w²` fit int64 — i.e.
  * n·S and max(w)²·n below ~9·10¹⁸. Gini/HHI/top-k share are all
  * SCALE-INVARIANT in the weights, so callers at the edge normalize
  * the weight unit (counts instead of cents, thousands instead of
  * units) rather than losing exactness.
  */
object Concentration {

  /** One-row frame: `n`, `total`, `gini_num/gini_den/gini`,
    * `hhi_num/hhi_den/hhi`, `topk_num/topk_den/topk_share`.
    *
    * @param df       one row per unit
    * @param unitCol  unique unit identity (the rank tiebreak)
    * @param weight   non-negative integer weight column
    * @param topK     units counted into the top-k share (by weight
    *                 descending)
    */
  def report(
      df: DataFrame, unitCol: Column, weight: Column,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val units = df.select(unitCol.as("unit"), weight.cast("long").as("w"))
    val n = units.count() // scalar anchor: one long
    val ranked = PrefixSum.runningTotal(
      units, Seq(col("w"), col("unit")), lit(1L), out = "i")
    ranked
      .agg(
        sum(col("w")).as("total"),
        sum(col("i") * col("w")).as("iw"),
        sum(col("w") * col("w")).as("ww"),
        sum(when(col("i") > lit(n - topK.toLong), col("w"))
          .otherwise(lit(0L))).as("topw"))
      .select(
        lit(n).as("n"), col("total"),
        (lit(2L) * col("iw") - lit(n + 1L) * col("total")).as("gini_num"),
        (lit(n) * col("total")).as("gini_den"),
        col("ww").as("hhi_num"),
        (col("total") * col("total")).as("hhi_den"),
        col("topw").as("topk_num"), col("total").as("topk_den"))
      .withColumn("gini", col("gini_num") / col("gini_den"))
      .withColumn("hhi", col("hhi_num") / col("hhi_den"))
      .withColumn("topk_share", col("topk_num") / col("topk_den"))
  }
}
