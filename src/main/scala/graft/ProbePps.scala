package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PPS-family prober: runMain graft.ProbePps <sfDir> — prints the raw
  * Horvitz–Thompson count ratio, hit count, and wall time for both the
  * md5 oracle family and the xxhash64 production family, so q278's
  * pinned band and SCALE.md's family comparison are measured. */
object ProbePps {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = 1000L
    val wExpr = "cast(round(o_totalprice * 100) as bigint)"
    val orders = graft.core.Tables.orders(spark, dir)
    val pop = orders.select(col("o_orderkey").as("id"),
        expr(wExpr).as("w_pop")).filter(col("w_pop") > 0L)
    val st = pop.agg(count(lit(1)), sum(col("w_pop"))).head()
    val (nPop, bigW) = (st.getLong(0), st.getLong(1))
    def report(label: String, hits: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = hits.agg(count(lit(1)), sum(col("multiplicity")),
        sum(col("multiplicity").cast("double") * lit(bigW.toDouble) /
          (lit(m.toDouble) * col("w")))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label $dir: hits=${r.getLong(0)} summult=${r.getLong(1)} " +
        f"ht=${r.getDouble(2)}%.1f n_pop=$nPop ratio=${r.getDouble(2) / nPop}%.4f " +
        f"time=$dt%.2f s")
    }
    report("md5 ", graft.operators.PpsSample.sample(
      orders, col("o_orderkey"), expr(wExpr), m))
    report("fast", graft.operators.PpsSample.sampleFast(
      orders, col("o_orderkey"), expr(wExpr), m))
    spark.stop()
  }
}
