package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.BigramFamiliarity

/** Shuffle-volume probe for the bigram-familiarity family (BENCHMARKING
  * ONLY): one variant per JVM, reporting wall-clock and per-stage
  * shuffle-write bytes.
  *
  * Why bytes and not seconds: on local[32] all three variants are
  * wall-clock-identical — the per-token explode/concat work dominates
  * and "shuffle" is a memory-local file copy. On a 1000-executor
  * cluster the exchange crosses the network, and THAT cost is
  * proportional to the bytes metered here: the string path exchanges
  * every bigram occurrence as text twice (count agg + count join); the
  * hashed path exchanges 8-byte longs; the top-K path broadcasts K rows
  * so the occurrence-side join exchange disappears entirely.
  *
  * Auto-broadcast is DISABLED here, deliberately: the synthetic corpus
  * has a bounded vocabulary, so its count table squeezes under the
  * broadcast threshold and Catalyst turns the count join into a
  * broadcast for every variant — hiding exactly the exchange this probe
  * meters. Real corpora are the opposite regime (Heaps' law: distinct
  * bigrams grow ~n^0.7, far past any broadcast threshold at 100 TB), and
  * `-1` models it: the optimizer CANNOT broadcast the counts, only
  * scoreTopK's explicit K-row broadcast survives. Map-side partial
  * aggregation also bounds the count-agg exchange by vocabulary — that
  * stays on, it helps all variants equally and a real cluster gets it
  * too.
  *
  * Usage: runMain graft.ProbeBigram <sfDir> <string|hashed|topk>
  */
object ProbeBigram {

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
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val t0 = System.nanoTime()
    val out = mode match {
      case "string" =>
        // the q174 oracled shape: both shuffles keyed on the bigram text
        val occ = BigramFamiliarity.bigrams(docs, "doc_id", "text")
        val counts = occ.groupBy(col("bigram"))
          .agg(count(lit(1)).as("bg_count"))
        occ.join(counts, Seq("bigram"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("bg_count")).as("familiar_sum"))
      case "hashed" =>
        BigramFamiliarity.scoreHashed(docs, "doc_id", "text")
      case "topk" =>
        BigramFamiliarity.scoreTopK(docs, "doc_id", "text", k = 100)
    }
    out.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop() // drains the async listener bus before reading the meter
    val stages = meter.stages
      .map { case (id, b) => s""""s$id":$b""" }.mkString("{", ",", "}")
    println(f"""{"path":"$mode","shuffle_bytes":${meter.bytes},"per_stage":$stages,"sec":$sec%.2f}""")
  }
}
