package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the incremental MinHash path (BENCHMARKING ONLY): a
  * FIXED 100-document batch dedups against a growing corpus, comparing
  *   - index: one-time corpus bucket-index build (amortized over batches)
  *   - incremental: the per-batch cost (batch signatures + index join +
  *     candidate-only verification)
  *   - full: recomputing nearDuplicates over corpus ∪ batch
  * The claim under test: incremental stays ~batch-sized as the corpus
  * grows, while the full recompute grows with the corpus.
  *
  * Usage: runMain graft.ProbeIncrementalDedup <sfDir>
  */
object ProbeIncrementalDedup {
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
    val cut = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) - 99L
    val corpus = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)
    val work = java.nio.file.Files
      .createTempDirectory("graft-probe-incdedup").toString

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val (tIndex, nIndex) = timed {
      graft.dedup.MinHash.buckets(
          graft.dedup.MinHash.signatures(
            graft.dedup.MinHash.shingles(corpus, "doc_id", "text", 3),
            "doc_id", 32),
          "doc_id", 32, 8)
        .write.parquet(s"$work/index")
      spark.read.parquet(s"$work/index").count()
    }
    val (tInc, nInc) = timed {
      graft.dedup.MinHash.incrementalNearDuplicates(
        batch, corpus, spark.read.parquet(s"$work/index"),
        "doc_id", "text", shingleLen = 3, numPerms = 32, bands = 8,
        threshold = 0.3).count()
    }
    // SPARK_GRAFT_SKIP_FULL=1 skips the full-recompute comparison leg:
    // at the 100× tier that leg shuffles tens of GB (it is exactly the
    // job the incremental path exists to avoid) and one probe run of it
    // filled the sandbox disk — the steady-state numbers users care
    // about are index_sec (amortized) and incremental_sec (per batch).
    val skipFull = sys.env.get("SPARK_GRAFT_SKIP_FULL").contains("1")
    val (tFull, nFull) = if (skipFull) (-1.0, -1L) else timed {
      graft.dedup.MinHash.nearDuplicates(
        corpus.unionByName(batch), "doc_id", "text",
        shingleLen = 3, numPerms = 32, bands = 8, threshold = 0.3).count()
    }
    println(f"""{"corpus_docs":${cut},"index_sec":$tIndex%.2f,"index_rows":$nIndex,"incremental_sec":$tInc%.2f,"incremental_pairs":$nInc,"full_sec":$tFull%.2f,"full_pairs":$nFull}""")
    spark.stop()
  }
}
