package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the q148 end-to-end curation pipeline (BENCHMARKING
  * ONLY), run in its PRODUCTION configuration: the near-dup pair source
  * uses the codegen xxhash64 fingerprint with the maxBlockSize skew cap
  * (the q132-verified guard), where the q148 oracle deliberately runs
  * the uncapped polyHash62 verification config so its pair set equals
  * q47's brute-force SQL closure. The uncapped config is the DECLARED
  * quadratic baseline — probing it at 30× benchmarks the blow-up, not
  * the pipeline (it exhausts an 8 GiB driver on the factor-30 corpus).
  *
  * Stages timed separately so the scale report can attribute cost:
  *   tok+gate+pairs (scan → token stats → quality gate → capped SimHash)
  *   cluster+split+manifest (label propagation → keepCanonical → hash
  *   split → per-(split, lang) manifest agg)
  *
  * Usage: runMain graft.ProbeCuration <sfDir>
  */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val stats = docs.select(col("doc_id"), col("lang"), col("source"),
      col("text"),
      size(filter(split(col("text"), " "), t => t =!= ""))
        .cast("long").as("n_tokens"))
    val good = stats.filter(col("n_tokens") >= 20)

    val (tPairs, (pairs, nPairs)) = timed {
      val p = graft.dedup.SimHash.nearDuplicates(
          good, "doc_id", "text", maxHamming = 4,
          maxBlockSize = Some(64))
        .transform(graft.core.Pin.apply)
      (p, p.count())
    }
    val (tRest, _) = timed {
      val kept = graft.dedup.Clusters.keepCanonical(good, "doc_id", pairs)
      graft.operators.DataSplit.assign(
          kept.select(col("doc_id"), col("lang"), col("source"),
            col("n_tokens")),
          "source", salt = "graft-r5", trainFrac = 0.8, valFrac = 0.1)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens_total"))
        .write.format("noop").mode("overwrite").save()
    }
    println(s"""{"probe":"curation","sf":"$sfDir",""" +
      s""""pairs_sec":$tPairs,"n_pairs":$nPairs,""" +
      s""""cluster_split_manifest_sec":$tRest}""")
    spark.stop()
  }
}
