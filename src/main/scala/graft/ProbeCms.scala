package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** CMS hash-family build-cost probe: times the md5 (oracle) and
  * xxhash64 (production) sketch builds over the same key column —
  * runMain graft.ProbeCms <sfDir>. Adjudicates the SCALE.md claim that
  * the production bucket removes q206's md5-bound build cost. */
object ProbeCms {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = graft.core.Tables.lineitem(spark, dir).select(col("l_partkey"))

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[cms] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("md5 sketch 4x4096")(
      CountMin.sketch(keys, "l_partkey", depth = 4, hexChars = 3))
    time("xxhash64 sketch 4x4096")(
      CountMin.sketchFast(keys, "l_partkey", depth = 4, width = 4096))
    spark.stop()
  }
}
