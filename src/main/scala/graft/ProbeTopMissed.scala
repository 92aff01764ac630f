package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown of q100_top_missed — runMain graft.ProbeTopMissed
  * <sfDir>. q100 is two machines glued together: the shared-neighbor
  * pair sweep ([[graft.similarity.SharedNeighbors]]) and the playlist
  * assembly (scoring join, history anti-join, artist-cap windows —
  * top_missed_recordings.py:43-103). Bench/ProbeOne time only the
  * whole; optimizing either half needs the split. Each leg is timed
  * through a noop materialization, sequentially, in one session. */
object ProbeTopMissed {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
      println(f"[tm] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val l = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        col("l_partkey").as("recording_mbid"),
        col("l_shipdate").as("listened_at"))
    val cp = t("cp distinct+pin")(
      l.select(col("user_id"), col("recording_mbid")).distinct()
        .transform(graft.core.Pin.apply))
    val similar = t("shared-neighbor sweep (materialized)") {
      val s = graft.similarity.SharedNeighbors.topK(
          cp, "user_id", "recording_mbid", k = 3)
        .transform(graft.core.Pin.apply)
      s
    }
    val artists = graft.core.Tables.part(spark, dir)
      .select(col("p_partkey").as("recording_mbid"),
        array(col("p_brand")).as("artist_mbids"))
    val shuffleKey = (col("recording_mbid") * 2654435761L) % 1000000007L
    t("playlist assembly (scoring join + anti + caps)")(noop(
      graft.yim.Yim.topMissedRecordings(l, similar, artists, shuffleKey,
        java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))))
    spark.stop()
  }
}
