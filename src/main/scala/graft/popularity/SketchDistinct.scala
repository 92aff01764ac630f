package graft.popularity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted mergeable distinct-count sketches — the incremental answer
  * to "distinct listeners per entity" at 100 TB: an exact
  * `count(DISTINCT user)` must re-shuffle every historical row on every
  * refresh, but a DataSketches HLL sketch column is a bounded-size
  * partial aggregate that PERSISTS (a binary column in parquet), MERGES
  * (union is associative/commutative, the same algebra contract as the
  * incremental stats engine's partial/combine split), and serves
  * estimates without ever rescanning history: each ingest increment
  * contributes one per-key sketch row, and a refresh unions sketch rows
  * — O(increments × keys), independent of listen history size.
  *
  * Error is the standard HLL envelope (rsd ≈ 1.04 / √2^lgK — about 1.6%
  * at the default lgK=12); the exact path stays available where the
  * product needs exact numbers (reference context: the popularity
  * family's exact distinct listener counts, popularity/popularity.py).
  */
object SketchDistinct {

  /** One increment's partial: per `keys`, the HLL sketch of `valueCol`
    * plus the increment's exact row count (count is itself mergeable by
    * sum). The output is a normal DataFrame — write it to parquet beside
    * the increment and it becomes durable sketch state. */
  def partial(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "partial needs at least one key")
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Serve estimates from accumulated partials (any number of
    * increments, any order): per `keys`, the merged distinct estimate
    * and summed row count. Only the sketch rows are shuffled — the data
    * they summarize is never touched again. */
  def serve(partials: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "serve needs at least one key")
    partials.groupBy(keys.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("hll"), lit(true)))
          .as("distinct_est"),
        sum(col("n_rows")).as("n_rows"))
  }
}
