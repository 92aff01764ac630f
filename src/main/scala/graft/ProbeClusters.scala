package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for duplicate-cluster resolution (BENCHMARKING ONLY),
  * separating the two stages q145 fuses:
  *   - pairs: SimHash near-dup pair generation in its PRODUCTION config
  *     (codegen xxhash64, maxBlockSize cap — the skew-guarded path; the
  *     q145 oracle deliberately runs the uncapped polyHash62 verification
  *     config instead, which is the declared quadratic baseline)
  *   - cluster: Clusters.assign over the materialized pairs — the label
  *     propagation itself, whose per-round cost is one join + one agg
  *     over the edge set.
  * The claim under test: clustering is linear in the pair count and the
  * pair count stays bounded under the block cap, so the super-linear term
  * in q145's uncapped probe is the verification-baseline pair source, not
  * the new operator.
  *
  * Usage: runMain graft.ProbeClusters <sfDir>
  */
object ProbeClusters {
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

    val (tPairs, pairs) = timed {
      val p = graft.dedup.SimHash.nearDuplicates(
          docs, "doc_id", "text", maxHamming = 4,
          maxBlockSize = Some(64))
        .transform(graft.core.Pin.apply)
      (p, p.count())
    }
    // time ONE evaluation of the assignment (the noop sink); the
    // cluster-count diagnostic reads the cheap label frame afterwards so
    // the timing isn't contaminated by a second pass over the assembly
    val (tCluster, _) = timed {
      graft.dedup.Clusters.assign(docs, "doc_id", pairs._1)
        .write.format("noop").mode("overwrite").save()
    }
    val nMulti = graft.dedup.Clusters
      .connectedComponents(pairs._1, "id_a", "id_b")
      .groupBy(col("comp")).count().filter(col("count") > 1).count()
    println(s"""{"probe":"clusters","sf":"$sfDir",""" +
      s""""pairs_sec":$tPairs,"n_pairs":${pairs._2},""" +
      s""""cluster_sec":$tCluster,"n_multi_clusters":$nMulti}""")
    spark.stop()
  }
}
