package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit — the privacy-governance gate for
  * a release candidate: every combination of quasi-identifiers must be
  * shared by ≥ k rows (otherwise the combination re-identifies), and
  * each such equivalence class must contain ≥ l distinct values of the
  * sensitive attribute (otherwise membership in the class leaks the
  * sensitive value even at k-anonymity — Machanavajjhala et al.'s
  * l-diversity).
  *
  * Exactness: one `groupBy(quasi-identifiers)` with exact bigint class
  * size and exact `count(DISTINCT sensitive)` per class, folded into a
  * one-row report — class counts, rows-at-risk, worst class sizes, and
  * the at-risk SHARE as a ratio of bigints. No sampling: the audit is
  * the one place an approximate distinct is wrong by construction (a
  * sketch can claim diversity a class does not have).
  *
  * Scale shape (100 TB release candidate): one hash aggregate on the
  * quasi-identifier key (map-side combinable; the distinct-sensitive
  * count plans Spark's standard two-phase distinct expansion) + a
  * class-count-sized fold; rows never shuffle twice.
  */
object Anonymity {

  /** One-row report: `n_rows n_classes min_class_size
    * n_classes_below_k rows_below_k n_classes_below_l rows_below_l
    * risky_share` (share = rows violating EITHER gate / all rows, one
    * IEEE division of bigints).
    *
    * @param quasi     quasi-identifier columns defining the classes
    * @param sensitive the attribute l-diversity protects
    */
  def audit(
      df: DataFrame, quasi: Seq[Column], sensitive: Column, k: Long,
      l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1L && l >= 1L, s"k and l must be >= 1, got k=$k l=$l")
    val classes = df
      .groupBy(quasi: _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(sensitive).as("div"))
    classes.agg(
      sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("sz")).as("min_class_size"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_classes_below_k"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L))
        .as("rows_below_k"),
      sum(when(col("div") < l, 1L).otherwise(0L)).as("n_classes_below_l"),
      sum(when(col("div") < l, col("sz")).otherwise(0L))
        .as("rows_below_l"),
      sum(when(col("sz") < k || col("div") < l, col("sz"))
        .otherwise(0L)).as("rows_risky"))
      .withColumn("risky_share", col("rows_risky") / col("n_rows"))
  }
}
