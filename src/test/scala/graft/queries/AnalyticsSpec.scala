package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Structural invariants of the analytics family (q192–q199) on sf0.001 —
  * value-exactness is the driver oracle's job; these pin the laws the
  * shapes must obey on ANY input.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    Registry.byName(name).run(spark, sf("unused"))

  test("cohort retention: week-0 cells cover every user exactly once") {
    val df = q("q192_cohort_retention").cache()
    val week0 = df.filter($"weeks_since" === 0)
    // every cohort has a week-0 cell and its size equals n_users there
    assert(week0.filter($"n_users" =!= $"cohort_size").count() == 0)
    val users = graft.core.Tables.events(spark, sf(""))
      .select($"user_id").distinct().count()
    assert(week0.agg(sum($"n_users")).head.getLong(0) == users)
    // retention is bounded by (0, 1] and week 0 is exactly 1
    assert(df.filter($"retention" <= 0 || $"retention" > 1).count() == 0)
    assert(week0.filter($"retention" =!= 1.0).count() == 0)
  }

  test("cumulative distinct: final cum equals total distinct users and " +
    "cum is the running sum of new") {
    val df = q("q193_cumulative_distinct").cache()
    val users = graft.core.Tables.events(spark, sf(""))
      .select($"user_id").distinct().count()
    assert(df.orderBy($"day".desc).head.getAs[Long]("cum_users") == users)
    assert(df.agg(sum($"new_users")).head.getLong(0) == users)
    // active_users >= new_users on every day (a new user is active)
    assert(df.filter($"active_users" < $"new_users").count() == 0)
  }

  test("markov transitions: probabilities sum to 1 per source state") {
    val df = q("q194_markov_transitions")
    val sums = df.groupBy($"prev")
      .agg(sum($"n").as("n"), max($"out_total").as("tot"))
    assert(sums.filter($"n" =!= $"tot").count() == 0)
  }

  test("cooccur lift: symmetric counts bounded by marginals") {
    val df = q("q199_cooccur_lift")
    assert(df.filter($"n_ab" > $"n_a" || $"n_ab" > $"n_b").count() == 0)
    assert(df.filter($"e_a" >= $"e_b").count() == 0)
    assert(df.filter($"lift" <= 0).count() == 0)
  }
}
