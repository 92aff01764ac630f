package graft

import org.apache.spark.sql.SparkSession

/** Dup-family structure probe: counts docs, full near-dup pairs,
  * connectivity-sufficient componentEdges, and distinct fingerprints on
  * a corpus dir — the measurement behind the q145/q148 quadratic-pair
  * diagnosis (SCALE.md round 8). runMain graft.ProbeDupFamilies <dir>. */
object ProbeDupFamilies {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, args(0))
    val pairs = graft.dedup.SimHash.nearDuplicates(
      docs, "doc_id", "text", maxHamming = 4,
      tokenHash = graft.functions.GraftFunctions.polyHash62,
      totalBits = 62, hashDistinct = true)
    println("docs: " + docs.count())
    println("pairs: " + pairs.count())
    val edges = graft.dedup.SimHash.componentEdges(
      docs, "doc_id", "text", maxHamming = 4,
      tokenHash = graft.functions.GraftFunctions.polyHash62,
      totalBits = 62, hashDistinct = true)
    println("componentEdges: " + edges.count())
    println("distinct fingerprints: " + graft.dedup.SimHash.fingerprints(
      docs, "doc_id", "text", graft.functions.GraftFunctions.polyHash62,
      62, hashDistinct = true).select("simhash").distinct().count())
    spark.stop()
  }
}
