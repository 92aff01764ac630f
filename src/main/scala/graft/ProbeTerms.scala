package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-term volume prober: runMain graft.ProbeTerms <sfDir> — prints
  * the measured Σd·(d−1)/2 term count and the autoChunks verdict for
  * the q230 (item-pairs-by-user) and q101 (user-pairs-by-item) counts
  * frames, so chunk budgets are sized from numbers, not guesses. */
object ProbeTerms {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def report(label: String, counts: org.apache.spark.sql.DataFrame,
        itCol: String): Unit = {
      val d = counts.groupBy(col(itCol)).agg(count(lit(1)).as("d"))
        .agg(sum((col("d") * (col("d") - lit(1)) / lit(2)).cast("long")),
          count(lit(1)), max(col("d"))).head()
      val terms = if (d.isNullAt(0)) 0L else d.getLong(0)
      println(s"$label: terms=$terms keys=${d.getLong(1)} maxDeg=${d.getLong(2)} " +
        s"chunks=${graft.similarity.ChunkedPairs.autoChunks(counts, itCol)}")
    }
    // the q230 listens mapping (lineitem ⋈ orders), inlined
    val ev = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        col("l_partkey").as("recording_mbid"))
    val cutRec =
      (ev.agg(max(col("recording_mbid"))).collect()(0).getLong(0) + 1L) *
        4L / 5L
    val basePres = ev.filter(col("recording_mbid") < cutRec)
      .select(col("recording_mbid").as("item"), col("user_id").as("user"))
      .distinct()
    report("q230 base (items-by-user)",
      basePres.select(col("item"), col("user"), lit(1L).as("c")), "user")
    spark.stop()
  }
}
