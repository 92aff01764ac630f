package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window sequence extraction over per-key event histories —
  * the sequence-model training-data generator: every `stride`-th
  * position in a user's time-ordered history emits the trailing `k`
  * events as one training sequence (next-item prediction, session
  * recommendation, behavioral LM). The text twin is q142's overlapping
  * doc chunking; this is the same fencepost discipline applied to
  * keyed, ordered event streams.
  *
  * Scale shape (100 TB): ONE shuffle keyed on the user; rank and the
  * sliding collect run over the same (key, order) sort, so Spark plans
  * a single window stage — per-row state is the k-element frame, never
  * the whole history. Emitted sequences are k/stride × input rows;
  * stride controls the blow-up explicitly.
  *
  * Determinism: ordering is (orderCol, tieCol) with a unique tie
  * breaker, so every window's contents are a pure function of the
  * input.
  */
object EventWindows {

  /** Per `keyCol`: rows at ranks k, k+stride, k+2·stride, … each with
    * `seq` = the `payload` values of the trailing `k` events in
    * (orderCol, tieCol) order, plus `end_rank`. Histories shorter than
    * `k` emit nothing (no ragged sequences). */
  def trailing(
      events: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      payload: Column, k: Int, stride: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val reserved = Seq("end_rank", "seq").filter(events.columns.contains)
    require(reserved.isEmpty,
      s"input already has ${reserved.mkString(", ")} — rename before windowing")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    events
      .withColumn("end_rank", row_number().over(w))
      .withColumn("seq",
        collect_list(payload).over(w.rowsBetween(-(k - 1), 0)))
      .filter(col("end_rank") >= k &&
        pmod(col("end_rank") - k, lit(stride)) === 0)
      .select(col(keyCol), col("end_rank"), col("seq"))
  }
}
