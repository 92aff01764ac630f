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
}
