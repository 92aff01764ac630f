package graft.queries

import graft.SparkSpec

/** Plan-shape tripwire for the scale invariant the whole library is built
  * around: candidate generation is always bounded by a key (bucket, block,
  * cluster, session, broadcast dim) — a plan that degrades to an
  * un-broadcast CartesianProduct is quadratic in shuffle volume and will
  * not survive 100 TB, even if it passes every value check at test scale.
  * Building the physical plan costs footer reads only, so every query is
  * guarded (queries whose construction eagerly runs jobs — ALS training,
  * store round-trips — still only pay sf0.001).
  */
class PlanGuardSpec extends SparkSpec {

  // q80: the CartesianProduct lives inside spark.ml's
  // recommendForUserSubset — ALS scoring IS a blocked users×items cross
  // join (the reference calls the same API, recommend.py:293-305); graft
  // code contributes no cartesian node to the plan.
  private val inherentlyCartesian = Set("q80_als_recommend")

  test("no query plans an un-broadcast cartesian product") {
    val offenders = Registry.all.flatMap { q =>
      val plan = scala.util.Try(
        q.run(spark, sf("")).queryExecution.executedPlan.toString)
      plan.toOption.filter(_.contains("CartesianProduct")).map(_ => q.name)
    }.filterNot(inherentlyCartesian)
    assert(offenders.isEmpty,
      s"un-broadcast cartesian plans (quadratic shuffle at scale): $offenders")
  }

  test("split assignment is a pure projection; quantile floor never shuffles the corpus") {
    import org.apache.spark.sql.functions._
    import graft.core.Bucketing
    // q146's operator: no exchange at all before the caller's sink — the
    // assignment must fuse into the scan at 100 TB
    val assigned = graft.operators.DataSplit.assign(
      graft.core.Tables.documents(spark, sf("")).select(col("doc_id"),
        col("source")), "source", salt = "s")
    assert(Bucketing.isExchangeFree(assigned),
      "split assignment must not shuffle")
    // q147's filter pass: thresholds broadcast, so the only shuffles are
    // pass 1's (group, score) histogram (distinct score values, not
    // corpus rows)
    val stats = graft.core.Tables.documents(spark, sf(""))
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val floored = graft.operators.QuantileFloor.applyFloor(stats,
      graft.operators.QuantileFloor.thresholds(
        stats, "lang", "n_tokens", 0.1),
      "lang", "n_tokens")
    val plan = floored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold join must broadcast:\n$plan")
  }
}
