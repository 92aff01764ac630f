package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: a two-stage aggregation that spreads a
  * hot key over `buckets` shuffle partitions before the final combine.
  *
  * At 100 TB a handful of degenerate keys (one bot user, one empty-string
  * artist) can pin a single reducer; salting bounds any key's partition to
  * ~1/buckets of its rows. AQE's skew handling covers joins; this covers
  * aggregations, where AQE cannot split a running hash aggregate. Only
  * associative aggregates may be salted this way — the same algebra
  * contract as the incremental engine's partial/combine split.
  */
object Salting {

  /** groupBy(keys).agg(count, sum(valueCol)) executed as a salted
    * two-stage aggregation. Result is identical to the direct aggregation
    * (proved in SaltingSpec) but no single task ever sees more than
    * ~1/buckets of any one key's rows. */
  def saltedCountSum(
      df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    // stage 1: per (keys, salt) partial — a hot key splits across buckets;
    // the salt is row-position-derived, so it needs no key statistics
    val partial = df
      .withColumn("_salt", (monotonically_increasing_id() % buckets).cast("int"))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
    // stage 2: combine partials per keys
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("sum"))
  }

  /** Inner equi-join executed skew-proof by salting: the (large, skewed)
    * `facts` side gets a row-derived salt in [0, buckets); the (smaller,
    * but not broadcastable) `dim` side is REPLICATED once per salt value;
    * the join runs on (keys :+ salt), so a hot fact key spreads over
    * `buckets` reducers instead of pinning one.
    *
    * Result is identical to `facts.join(dim, keys)` (proved in
    * SaltingSpec and oracled as q154). Cost model: dim is shuffled
    * `buckets` times — use when dim is too big to broadcast yet far
    * smaller than the skewed fact side, and AQE's post-hoc skew split
    * cannot apply (e.g. the join feeds a co-partitioned downstream op,
    * or runtime re-planning is off). `buckets` bounds any single task's
    * share of a hot key at ~1/buckets. No uniqueness assumption on
    * either side: every dim row is replicated to ALL salt values and
    * every fact row carries exactly one, so join multiplicities are
    * preserved exactly. */
  def saltedJoin(
      facts: DataFrame, dim: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 4096,
      s"buckets must be in [1,4096], got $buckets")
    require(keys.nonEmpty, "saltedJoin needs at least one key")
    val clash = (facts.columns ++ dim.columns).find(_ == "_salt")
    require(clash.isEmpty,
      "input already has a _salt column — rename it before salting")
    val salted = facts.withColumn("_salt",
      (monotonically_increasing_id() % buckets).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
