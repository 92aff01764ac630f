package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TimeDecay.decayedCounts]] — bit-exact chain replay, horizon
  * bounds, half-life anchors, and partition invariance. */
class TimeDecaySpec extends SparkSpec {

  private val horizon = 10
  private val halfLife = 3.0

  // (key, day) — day 0 is the anchor date itself
  private val rows: Seq[(Long, Int)] = {
    val rnd = new scala.util.Random(71)
    Seq.fill(400)((rnd.nextInt(6).toLong, rnd.nextInt(14) - 2))
  }

  private def df = {
    import spark.implicits._
    rows.map { case (k, day) =>
      (k, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 20).minusDays(day.toLong)
          .atTime(12, 0)))
    }.toDF("k", "ts").repartition(5)
  }

  private def run() =
    TimeDecay.decayedCounts(df, col("k"), col("ts"), "2024-03-20",
      horizon, halfLife)
      .collect()
      .map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_score")))
      .toMap

  test("scores replay bit-exactly in an independent fixed-order " +
    "implementation and the horizon excludes out-of-range rows") {
    val got = run()
    val w = TimeDecay.weights(horizon, halfLife)
    rows.groupBy(_._1).foreach { case (k, g) =>
      val inRange = g.map(_._2).filter(d => d >= 0 && d < horizon)
      if (inRange.isEmpty) assert(!got.contains(k), s"key $k")
      else {
        val counts = (0 until horizon)
          .map(o => inRange.count(_ == o).toLong)
        var acc = counts.head * w.head
        (1 until horizon).foreach(o => acc = acc + counts(o) * w(o))
        val (n, score) = got(k)
        assert(n === inRange.size.toLong, s"key $k")
        assert(score === acc, s"key $k")
      }
    }
  }

  test("half-life semantics: a count h days old weighs exactly half " +
    "of today's") {
    val w = TimeDecay.weights(horizon, halfLife)
    assert(w(0) === 1.0)
    assert(math.abs(w(3) - 0.5) < 1e-15)
    assert(math.abs(w(6) - 0.25) < 1e-15)
  }

  test("plan shape: one hash exchange, no join, no window — events " +
    "never re-shuffle per day") {
    val plan = TimeDecay.decayedCounts(df, col("k"), col("ts"),
      "2024-03-20", horizon, halfLife)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.toLowerCase.contains("window("), plan)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val one = rows.map { case (k, day) =>
      (k, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 20).minusDays(day.toLong)
          .atTime(12, 0)))
    }.toDF("k", "ts").coalesce(1)
    val a = TimeDecay.decayedCounts(one, col("k"), col("ts"),
      "2024-03-20", horizon, halfLife).orderBy(col("key"))
      .collect().toSeq
    val b = TimeDecay.decayedCounts(df, col("k"), col("ts"),
      "2024-03-20", horizon, halfLife).orderBy(col("key"))
      .collect().toSeq
    assert(a === b)
  }
}
