package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown of the chunked pair path on q101's counts frame —
  * runMain graft.ProbeChunkedPairs <sfDir> [chunks]. Times the bucket
  * write, each chunk job, and the final merge separately so chunk-count
  * tuning rests on measurement. */
object ProbeChunkedPairs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val chunks = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ev = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        col("l_partkey").as("recording_mbid"))
    val counts = t("counts pin")(
      ev.groupBy(col("user_id").as("u"), col("recording_mbid").as("it"))
        .agg(count(lit(1)).as("c")).transform(graft.core.Pin.apply))
    val buckets = cpus.toInt
    val work = graft.core.TempWork.dir("probe-cp")
    t("bucket write")(graft.core.Bucketing.writeBucketed(
      counts.repartition(buckets, col("it")),
      s"$work/bkt", "probe_cp_bkt", buckets, Seq("it")))
    val bk = graft.core.Bucketing.read(spark, "probe_cp_bkt")
    val a = bk.select(col("u").as("u1"), col("it"), col("c").as("c1"))
    val b = bk.select(col("u").as("u2"), col("it"), col("c").as("c2"))
    val route = pmod(xxhash64(col("u1")), lit(chunks))
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      a.filter(route === 0).join(b, Seq("it"))
        .filter(col("u1") < col("u2"))
        .groupBy(col("u1"), col("u2"))
        .agg(sum(col("c1") * col("c2")).as("dot"))
        .explain("formatted")
    (0 until chunks).foreach { i =>
      t(s"chunk $i")(
        a.filter(route === i).join(b, Seq("it"))
          .filter(col("u1") < col("u2"))
          .groupBy(col("u1"), col("u2"))
          .agg(sum(col("c1") * col("c2")).as("dot"))
          .write.mode("overwrite").parquet(s"$work/chunk_$i"))
    }
    t("merge read")(println("rows: " + spark.read.parquet(
      (0 until chunks).map(i => s"$work/chunk_$i"): _*).count()))
    spark.stop()
  }
}
