package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window training-example extraction for next-item
  * prediction: per entity, the ordered interaction stream becomes
  * `(context[1..k], label)` rows — the supervised frame behind
  * sequential recommenders and next-token-style models (reference
  * analogue: the listen sequences its recommender consumes, reshaped
  * to the windowed form trainers actually ingest).
  *
  * Shape: ONE window pass per entity — k `lag` columns share a single
  * `WindowSpec` (one shuffle on the entity key, one partition-local
  * sort; the engine's shared-WindowSpec discipline, W12), rows with
  * incomplete context dropped. The context is emitted as k SCALAR
  * columns, not an array — the training-data interchange the engine's
  * verified frames use (and the driver's comparator requires).
  *
  * Scale: the shuffle is the entity key's, identical to any per-user
  * aggregate; window frames are per-entity sequences, never global.
  * The total order within an entity must be strict — pass a
  * tie-breaking column in `orderCols` (event ids here), or replayed
  * logs reorder examples.
  */
object TrainingWindows {

  /** `(entity, orderCols..., ctx1..ctxK, label)` rows; ctx1 is the
    * OLDEST context element, ctxK the immediately-preceding one. */
  def nextItemExamples(
      df: DataFrame, entityCol: Column, orderCols: Seq[Column],
      itemCol: Column, contextLen: Int): DataFrame = {
    require(contextLen >= 1 && contextLen <= 64,
      s"contextLen must be in [1,64], got $contextLen")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(entityCol).orderBy(orderCols: _*)
    val withCtx = (1 to contextLen).foldLeft(df) { case (acc, i) =>
      // ctx_i = the item (contextLen - i + 1) steps back, so ctx1 is
      // the oldest — all lags ride the same WindowSpec: one exchange,
      // one sort
      acc.withColumn(s"ctx$i", lag(itemCol, contextLen - i + 1).over(w))
    }
    withCtx
      .filter((1 to contextLen).map(i => col(s"ctx$i").isNotNull)
        .reduce(_ && _))
      .withColumn("label", itemCol)
  }
}
