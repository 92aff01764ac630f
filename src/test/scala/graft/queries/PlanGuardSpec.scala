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
    // Round-5 lesson: a query whose plan fails to BUILD must fail this
    // guard loudly, not silently drop out of the tripwire — that exact
    // hole hid 57 schema-drift breaks for a round. No query is excused
    // today; if a future query legitimately cannot build here, name it
    // in an explicit exclusion set with the reason.
    val built = Registry.all.map { q =>
      q.name -> scala.util.Try(
        q.run(spark, sf("")).queryExecution.executedPlan.toString)
    }
    val broken = built.collect { case (n, scala.util.Failure(e)) =>
      s"$n: ${e.toString.linesIterator.next().take(160)}"
    }
    assert(broken.isEmpty,
      s"plans failed to build (schema drift? guard must see them): $broken")
    val offenders = built.collect {
      case (n, scala.util.Success(p)) if p.contains("CartesianProduct") => n
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
