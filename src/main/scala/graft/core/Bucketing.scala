package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketed materialization for co-located execution — the shuffle-removal
  * lever the builder brief calls out ("repartition()/bucketing for
  * co-located joins"). A table written with `bucketBy(n, key)` records its
  * hash layout in the catalog; any aggregation grouped on the key and any
  * equi-join between two tables bucketed the same way then satisfies its
  * required distribution straight off the scan — zero Exchange in the
  * plan.
  *
  * Where this pays at 100 TB: the listen store's user-keyed read path. Per
  * -user stats, similarity preprocessing, and the YIM family ALL open with
  * `groupBy(user_id)`; against a plain parquet layout every one of those
  * runs re-shuffles the same fact table on the same key. A user-bucketed
  * materialization pays that shuffle ONCE at write and amortizes it over
  * every downstream run — the same economics as the reference's cached
  * partial aggregates, one level lower.
  *
  * The bucket count is a layout constant (like the reference's fixed
  * year/month partitioning): both sides of a co-located join must agree on
  * it, so changing it means rewriting — pick ceil(totalBytes / targetBytes
  * per bucket) at initial materialization and leave headroom.
  */
object Bucketing {

  /** Backtick-quote a possibly-dotted table name the way saveAsTable
    * parses it (dots are database separators, each segment quoted). */
  private[graft] def quoted(table: String): String =
    table.split('.').map(seg => s"`${seg.replace("`", "``")}`").mkString(".")

  /** Write `df` as an external parquet table at `path`, bucketed (and
    * bucket-sorted) by `bucketCols` into `buckets` buckets. Replaces any
    * existing table registration of the same name. Re-materializing under a
    * DIFFERENT path only drops the catalog entry (external tables keep
    * their files); the caller owns deleting the old location, the same way
    * it owns the path choice. */
  def writeBucketed(
      df: DataFrame, path: String, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS ${quoted(table)}")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when no SHUFFLE exchange remains anywhere in `df`'s physical
    * plan — the property bucketing buys for key-aligned aggs and joins.
    * Matches the `ShuffleExchangeLike` node class exactly, so a broadcast
    * exchange (legitimately shuffle-free) does not trip it. */
  def isExchangeFree(df: DataFrame): Boolean =
    shuffleExchangeCount(df) == 0

  /** Count of shuffle-exchange nodes in the executed plan. AQE-aware in
    * BOTH phases: before execution the adaptive root is unwrapped; after
    * execution, materialized stages appear as QueryStageExec LEAVES whose
    * wrapped shuffles `collect` would never see — so the traversal
    * descends into stage plans explicitly instead of relying on
    * `children`. */
  def shuffleExchangeCount(df: DataFrame): Int =
    countShuffles(df.queryExecution.executedPlan)

  private def countShuffles(
      p: org.apache.spark.sql.execution.SparkPlan): Int = {
    val self = p match {
      case _: ShuffleExchangeLike => 1
      case _ => 0
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case o => o.children
    }
    self + children.map(countShuffles).sum
  }
}
