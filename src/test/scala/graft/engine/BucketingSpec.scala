package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Bucketing

/** Bucketing buys shuffle-free key-aligned execution: a groupBy on the
  * bucket key and an equi-join of two same-bucketed tables must both plan
  * with zero Exchange, and results must match the plain-parquet plans.
  */
class BucketingSpec extends SparkSpec {

  private def withConf[A](k: String, v: String)(f: => A): A = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  test("bucketed aggregation and co-located join plan with zero Exchange") {
    val ls = (1 to 40).map(i =>
      listen(i % 7, s"artist-${i % 5}", f"2024-01-${i % 27 + 1}%02d 10:00:00"))
    val df = listensDf(ls)

    Bucketing.writeBucketed(df, tmpDir("bkt-listens"), "bkt_listens",
      buckets = 4, bucketCols = Seq("user_id"))
    val counts = Bucketing.read(spark, "bkt_listens")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(Bucketing.isExchangeFree(counts),
      s"bucket-aligned agg must not shuffle:\n${counts.queryExecution.executedPlan}")
    assert(counts.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      df.groupBy(col("user_id")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)

    // a per-user profile bucketed the SAME way joins without any exchange
    val profiles = df.groupBy(col("user_id"))
      .agg(countDistinct(col("artist_name")).as("n_artists"))
    Bucketing.writeBucketed(profiles, tmpDir("bkt-profiles"), "bkt_profiles",
      buckets = 4, bucketCols = Seq("user_id"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Bucketing.read(spark, "bkt_listens")
        .join(Bucketing.read(spark, "bkt_profiles"), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), first(col("n_artists")).as("n_artists"))
      assert(Bucketing.isExchangeFree(joined),
        s"co-located join must not shuffle:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val want = df.join(profiles, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), first(col("n_artists")).as("n_artists"))
        .collect().map(r =>
          (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(got == want)
    }

    // mismatched bucket counts degrade gracefully: correct, but shuffles
    Bucketing.writeBucketed(profiles, tmpDir("bkt-mis"), "bkt_mis",
      buckets = 3, bucketCols = Seq("user_id"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val mis = Bucketing.read(spark, "bkt_listens")
        .join(Bucketing.read(spark, "bkt_mis"), Seq("user_id"))
      assert(mis.count() == 40)
    }
    Seq("bkt_listens", "bkt_profiles", "bkt_mis")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
