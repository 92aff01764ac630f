package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TrainingWindows.nextItemExamples]] — window content, incomplete-
  * context dropping, strict-order determinism, and the shared-
  * WindowSpec single-window plan. */
class TrainingWindowsSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (1L, 5L, "e"), (2L, 1L, "x"), (2L, 2L, "y"), (2L, 3L, "z"))
      .toDF("user", "seq", "item")
  }

  test("contexts slide oldest-first; incomplete contexts dropped") {
    val got = TrainingWindows.nextItemExamples(
      fixture, col("user"), Seq(col("seq")), col("item"), contextLen = 2)
      .select(col("user"), col("seq"), col("ctx1"), col("ctx2"),
        col("label"))
      .orderBy(col("user"), col("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(got === Seq(
      (1L, 3L, "a", "b", "c"), (1L, 4L, "b", "c", "d"),
      (1L, 5L, "c", "d", "e"), (2L, 3L, "x", "y", "z")))
  }

  test("all context lags share one window: exactly one Window node, " +
    "one exchange for the window stage") {
    val plan = TrainingWindows.nextItemExamples(
      fixture, col("user"), Seq(col("seq")), col("item"), contextLen = 4)
      .queryExecution.executedPlan.toString
    val windows = "(?m)^\\s*[+:*-]*\\s*Window ".r
      .findAllIn(plan).size
    assert(windows === 1, plan)
  }

  test("deterministic across partitionings (strict order key)") {
    def run(parts: Int) = TrainingWindows.nextItemExamples(
      fixture.repartition(parts), col("user"), Seq(col("seq")),
      col("item"), contextLen = 3)
      .orderBy(col("user"), col("seq"))
      .collect().map(_.toSeq).toSeq
    assert(run(1) === run(8))
  }
}
