package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the popularity family (BENCHMARKING ONLY, like
  * [[ScaleUp]]): runs [[graft.popularity.Popularity.entity]] (exact
  * two-stage countDistinct) and [[graft.popularity.Popularity.entityApprox]]
  * (HyperLogLog++) — the two paths dispatch's `popularity.* approx` flag
  * selects between — over the same scaled tables, reporting wall-clock and
  * per-stage shuffle-write bytes from a stage listener.
  *
  * What it demonstrates: the exact distinct's shuffle carries every
  * distinct (entity, user) pair — the term that grows with the listen
  * volume; the sketch path shuffles one fixed-size HLL register set per
  * entity, so its shuffle is bounded by ENTITY cardinality, independent of
  * how many users listened. This is the measured backing for dispatch's
  * `approx=true` escape hatch (reference economics: the 27B-listen MLHD
  * popularity, where users-per-entity is huge).
  *
  * Usage: runMain graft.ProbePopularity <sfDir> <exact|approx_hll>
  * (one path per JVM — the listener bus is asynchronous, so metering two
  * jobs in one session cross-contaminates the counters)
  */
object ProbePopularity {

  private final class ShuffleMeter extends SparkListener {
    private val perStage = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    def stages: Seq[(Int, Long)] = perStage.toSeq.sortBy(_._1)
    def bytes: Long = perStage.map(_._2).sum
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        perStage += ((s.stageInfo.stageId,
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, mode) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // cache the joined input so the lineitem⋈orders shuffle happens once,
    // OUTSIDE the measurement — the meter then sees only the aggregation
    // path's own shuffle.
    //
    // Entity = supplier FOLDED BACK to the unscaled key space: ScaleUp
    // shifts s_suppkey per copy, but the regime the sketch exists for is
    // the reference's — a FIXED entity space under growing listen volume
    // (the recording catalog doesn't 30× when the listen history does).
    // Folding reproduces that: entities constant, users-per-entity grows
    // with the factor.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") % 1000L).as("l_suppkey"), col("o_custkey"))
      .cache()
    li.count()

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val t0 = System.nanoTime()
    // sum the distinct-count column rather than count(): a bare count()
    // lets Catalyst PRUNE the aggregate functions (it only needs the
    // grouping keys), which would execute the identical plan for both
    // modes and measure nothing
    val totalUsers = mode match {
      case "exact" =>
        graft.popularity.Popularity.entity(li, "o_custkey", Seq("l_suppkey"))
          .agg(sum(col("total_user_count"))).collect()(0).getLong(0)
      case "approx_hll" =>
        graft.popularity.Popularity.entityApprox(
            li, "o_custkey", Seq("l_suppkey"))
          .agg(sum(col("approx_user_count"))).collect()(0).getLong(0)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // the bus is asynchronous: stop() drains it, so read the meter after
    spark.stop()
    val stages = meter.stages
      .map { case (id, b) => s""""s$id":$b""" }.mkString("{", ",", "}")
    println(f"""{"path":"$mode","sum_user_counts":$totalUsers,"shuffle_bytes":${meter.bytes},"per_stage":$stages,"sec":$sec%.2f}""")
  }
}
