package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skip-gram co-occurrence pair extraction (word2vec-style, Mikolov
  * et al. 2013) over ordered per-entity streams — the training-pair
  * generator behind item2vec / prod2vec sequence embeddings, and the
  * symmetric-window counterpart of [[TrainingWindows]]' next-item
  * frames. Each position becomes a CENTER; every position within
  * `window` steps on either side contributes one (center, context)
  * pair; the output is the aggregated pair-count frame an embedding
  * trainer (or the PMI scorer, q227) consumes.
  *
  * Shape: ONE window pass — the 2·w context columns are `lag`/`lead`
  * over a single shared `WindowSpec` (one exchange on the entity key +
  * one partition-local sort, the W12 discipline), then a posexplode of
  * the 2·w-wide array and a map-side-combinable count aggregate.
  * Compare the textbook self-join `on entity AND |pos_i − pos_j| ≤ w`,
  * which plans a per-entity cross product filtered after the fact —
  * quadratic in the longest session. Here output volume is exactly
  * ≤ 2·w·n rows pre-aggregation, linear always.
  *
  * Scale (100 TB of events): the only shuffles are the entity-key
  * exchange and the pair-count aggregate (distinct pairs, not
  * occurrences, cross the wire after partial aggregation). No join,
  * no skew cliff — a power user costs O(their rows · w), not O(rows²).
  */
object SkipGrams {

  /** `(center, context, pair_count)` for all ordered pairs within
    * `window` positions inside one entity's stream. Symmetric: the
    * (a,b) count at offset +d equals (b,a) at −d; both are emitted,
    * as trainers expect.
    *
    * @param orderCols strict total order within an entity (include a
    *                  tiebreak column, or replayed logs reorder pairs)
    */
  def pairs(
      df: DataFrame, entityCol: Column, orderCols: Seq[Column],
      itemCol: Column, window: Int): DataFrame = {
    require(window >= 1 && window <= 32,
      s"window must be in [1,32], got $window")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(entityCol).orderBy(orderCols: _*)
    val ctxCols: Seq[Column] =
      (1 to window).map(k => lag(itemCol, k).over(w)) ++
        (1 to window).map(k => lead(itemCol, k).over(w))
    df.select(itemCol.as("center"), array(ctxCols: _*).as("ctx"))
      .select(col("center"), explode(col("ctx")).as("context"))
      .filter(col("context").isNotNull)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("pair_count"))
  }
}
