package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the popularity family (BENCHMARKING ONLY, like
  * [[ScaleUp]]): runs the q77-shaped exact per-group popularity (two-stage
  * exact countDistinct over (group, entity, user)) and the HLL approx
  * variant ([[graft.popularity.Popularity.entityApprox]] economics) over
  * the same scaled tables, reporting wall-clock AND total shuffle-write
  * bytes per path from a stage listener.
  *
  * What it demonstrates: the exact distinct's shuffle carries every
  * distinct (group, entity, user) triple — the term that grows with the
  * data; the sketch path shuffles one fixed-size HLL register set per
  * (group, entity), so its shuffle is bounded by group cardinality, not
  * listen volume. This is the measured backing for dispatch's
  * `approx=true` escape hatch (reference economics: the 27B-listen MLHD
  * popularity).
  *
  * Usage: runMain graft.ProbePopularity <sfDir>
  */
object ProbePopularity {

  private final class ShuffleMeter extends SparkListener {
    @volatile var bytes = 0L
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      bytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // cache the joined input so the lineitem⋈orders shuffle happens once,
    // OUTSIDE both measurements — the meter then sees only each
    // aggregation path's own shuffle
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("l_partkey"), col("o_custkey"))
      .cache()
    li.count()

    def measure(label: String)(job: => Long): (String, Long, Long, Double) = {
      val meter = new ShuffleMeter
      spark.sparkContext.addSparkListener(meter)
      val t0 = System.nanoTime()
      val rows = job
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(meter)
      (label, rows, meter.bytes, sec)
    }

    // both paths ranked top-3 per supplier, identical output shape to q77
    val results = Seq(
      measure("exact") {
        graft.popularity.Popularity.perGroup(li, "o_custkey",
          Seq("l_suppkey"), Seq("l_partkey"), top = 3).count()
      },
      measure("approx_hll") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("total_listen_count").desc, col("l_partkey"))
        li.groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(count(lit(1)).as("total_listen_count"),
            approx_count_distinct(col("o_custkey"), 0.05)
              .as("approx_user_count"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .count()
      })

    results.foreach { case (label, rows, bytes, sec) =>
      println(f"""{"path":"$label","rows":$rows,"shuffle_bytes":$bytes,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
