package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Thresholded-DIMSUM prober: runMain graft.ProbeDimsum <sfDir>... —
  * for each scale factor, compares `UserCosine.dimsum(threshold)`
  * against the exact item-keyed pair join on the pairs whose TRUE
  * cosine clears the q81 production cut (0.9), printing recall and
  * the worst/mean relative estimation error, plus the same for the
  * exact-cosine >= threshold population. Measures the bands q280's
  * envelope pins. */
object ProbeDimsum {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val threshold =
      sys.env.getOrElse("SPARK_GRAFT_DIMSUM_T", "0.1").toDouble
    dirs.foreach { dir =>
      val ev = graft.core.Tables.lineitem(spark, dir)
        .join(graft.core.Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user_id"),
          col("l_partkey").as("recording_mbid"))
      val t0 = System.nanoTime()
      val est = graft.similarity.UserCosine
        .dimsum(ev, "user_id", "recording_mbid", threshold)
        .select(col("u1").cast("long").as("u1"),
          col("u2").cast("long").as("u2"), col("cosine").as("est"))
      val estN = est.count()
      val tD = (System.nanoTime() - t0) / 1e9
      val exact = graft.similarity.UserCosine
        .exact(ev, "user_id", "recording_mbid", minCosine = 0.0)
        .select(col("u1").cast("long").as("u1"),
          col("u2").cast("long").as("u2"),
          col("cosine_r").as("true_cos"))
      val dist = exact.agg(count(lit(1)),
        max(col("true_cos")),
        expr("percentile(true_cos, array(0.5, 0.9, 0.99, 0.999))")).head()
      println(s"$dir exactPairs=${dist.getLong(0)} maxcos=${dist.get(1)} " +
        s"pct=${dist.get(2)}")
      def stats(cut: Double): Unit = {
        val pop = exact.filter(col("true_cos") >= cut)
        val joined = pop.join(est, Seq("u1", "u2"), "left")
        val r = joined.agg(
          count(lit(1)).as("n"),
          coalesce(sum(when(col("est").isNotNull, 1L).otherwise(0L)),
            lit(0L)).as("found"),
          max(when(col("est").isNotNull,
            abs(col("est") - col("true_cos")) / col("true_cos")))
            .as("max_rel"),
          avg(when(col("est").isNotNull,
            abs(col("est") - col("true_cos")) / col("true_cos")))
            .as("mean_rel")).head()
        println(f"$dir cut=$cut%.2f n=${r.getLong(0)} " +
          f"found=${r.getLong(1)} maxrel=${Option(r.get(2)).getOrElse(-1.0)} " +
          f"meanrel=${Option(r.get(3)).getOrElse(-1.0)} " +
          f"estRows=$estN dimsumTime=$tD%.2f s")
      }
      Seq(0.2, 0.15, 0.12, 0.1).foreach(stats)
    }
    spark.stop()
  }
}
