package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Out-of-core chunked execution — the reference's pattern for datasets
  * whose intermediate state exceeds cluster memory (MLHD similarity runs
  * per user-prefix chunk 0-f, parquets each chunk's partial aggregate,
  * then combines: similarity/recording/common.py:190-213, mlhd.py:32-35).
  *
  * Given a provider whose combine() is associative (the engine's standard
  * contract), each chunk's partial is computed and persisted independently
  * — bounding the shuffle of any single job to one chunk's data — and the
  * final stats run over the union of the (much smaller) partials.
  */
object ChunkedRunner {

  /** @param chunkPredicates disjoint predicates covering the input (e.g.
    *        user-prefix ranges); each chunk is aggregated in its own job. */
  def run(
      spark: SparkSession,
      listens: DataFrame,
      provider: StatsProvider,
      chunkPredicates: Seq[Column],
      workDir: String): DataFrame = {
    val chunkPaths = chunkPredicates.zipWithIndex.map { case (pred, i) =>
      val path = s"$workDir/chunk_$i"
      provider.aggregate(listens.filter(pred))
        .write.mode("overwrite").parquet(path)
      path
    }
    val partials = spark.read.parquet(chunkPaths: _*)
    provider.stats(provider.combine(partials))
  }
}
