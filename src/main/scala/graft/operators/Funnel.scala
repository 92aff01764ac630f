package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the event-analytics staple: for each user,
  * when (if ever) did they complete step 1, then step 2 STRICTLY after
  * it, then step 3 after that. Step k's completion time is the earliest
  * event of step k's type that follows the step-(k−1) completion — the
  * standard strict-sequence semantics under which one event can never
  * satisfy two steps and re-orderings don't double count.
  *
  * Scale shape (100 TB): ONE shuffle, keyed on the user — each user's
  * events fold in timestamp order through a k-slot accumulator (k =
  * funnel length, a constant), so the work is linear in events with no
  * self-join per step (the naive k-way join shuffles the event table k
  * times and detonates on power users). The fold is
  * `functions.aggregate` over a sorted in-group array: per-user memory
  * is that user's event count — the same per-key bound every
  * sessionization op already carries (W6), with the watermark/state
  * variant the streaming path for unbounded histories.
  *
  * Determinism: processing order is (ts, type); completion times are
  * minima, so tie order between different types at one timestamp cannot
  * change any step's completion (a later step at the same timestamp
  * fails the STRICT > either way).
  */
object Funnel {

  /** Per-user completion times for `steps` (distinct event types, in
    * funnel order): `(user, t_1..t_k as step_1..step_k, steps_completed)`.
    * Users with no step-1 event still appear (all-null row) — conversion
    * denominators need them. */
  def completions(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    val stepArr = array(steps.map(lit): _*)

    val folded = events
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(
        struct(unix_micros(col(tsCol)).as("t"), col(typeCol).as("y"))))
        .as("__evs"))
      .withColumn("__acc", aggregate(
        col("__evs"),
        array_repeat(lit(null).cast("long"), k),
        (acc, e) => transform(acc, (v, i) => {
          // prev slot read is index-guarded: for i = 0 the value is
          // irrelevant but must not trip ANSI's 1-based element_at
          val prev = element_at(acc, greatest(i, lit(1)))
          val inOrder = when(i === 0, lit(true))
            .otherwise(prev.isNotNull && e.getField("t") > prev)
          when(v.isNull &&
            e.getField("y") === element_at(stepArr, i + 1) && inOrder,
            e.getField("t")).otherwise(v)
        })))

    val stepCols = steps.zipWithIndex.map { case (_, i) =>
      timestamp_micros(element_at(col("__acc"), i + 1)).as(s"step_${i + 1}")
    }
    val completed = aggregate(col("__acc"), lit(0L),
      (n, v) => when(v.isNotNull, n + 1L).otherwise(n))
    folded.select(
      (col(userCol) +: stepCols) :+ completed.as("steps_completed"): _*)
  }
}
