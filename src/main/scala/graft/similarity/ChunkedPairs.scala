package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Out-of-core shared-item pair aggregation — the reference's MLHD
  * chunking (similarity/recording/common.py:190-213: aggregate per
  * user-prefix chunk, parquet each partial, combine) applied to the
  * co-listen pair stage that dominates every user-similarity job.
  *
  * The exact pair aggregate Σ c1·c2 over users sharing an item is ONE
  * item-keyed join + ONE (u1, u2) aggregate — correct at any scale, but
  * its hash state is the full pair space of the corpus, the largest
  * single working set the engine materializes (the 4 GiB heap probe:
  * q100/q101 OOM at the production per-executor share while every
  * smaller stage survives). Chunking on u1 splits that one job into
  * `chunks` independent jobs — chunk i aggregates only pairs whose u1
  * routes to i, writes its (complete, disjoint) partial to parquet, and
  * the union of partials IS the answer: no combine arithmetic, because
  * a (u1, u2) key lives in exactly one chunk. Peak state per job drops
  * by ~chunks; the join's build side (the full counts frame) is read
  * from the caller's pin each time, not recomputed.
  *
  * This mirrors how the reference survives the 27B-listen MLHD corpus
  * on fixed executors, and it is the 100 TB shape: the pair space never
  * has to fit one job's memory — `chunks` scales it down arbitrarily,
  * trading sequential jobs for peak footprint.
  */
object ChunkedPairs {

  /** `(u1, u2, dot)` with u1 < u2 and `dot = Σ_items c1·c2` over
    * `counts` rows `(uCol, itCol, cCol)`. `chunks <= 1` runs the single
    * direct job; `chunks = n` runs n chunk jobs persisting parquet
    * partials under a fresh [[graft.core.TempWork]] dir (pass `workDir`
    * to persist elsewhere). Exact either way — chunk routing is a pure
    * function of u1, so partials are disjoint and complete. */
  def dots(
      counts: DataFrame, uCol: String, itCol: String, cCol: String,
      chunks: Int = 1, workDir: Option[String] = None): DataFrame = {
    require(chunks >= 1 && chunks <= 4096,
      s"chunks must be in [1,4096], got $chunks")
    val a = counts.select(col(uCol).as("u1"), col(itCol).as("it"),
      col(cCol).as("c1"))
    val b = counts.select(col(uCol).as("u2"), col(itCol).as("it"),
      col(cCol).as("c2"))
    def aggOf(aSide: DataFrame) = aSide.join(b, Seq("it"))
      .filter(col("u1") < col("u2"))
      .groupBy(col("u1"), col("u2"))
      .agg(sum(col("c1") * col("c2")).as("dot"))
    if (chunks <= 1) aggOf(a)
    else {
      val dir = workDir.getOrElse(graft.core.TempWork.dir("pair-chunks"))
      val route = pmod(xxhash64(col("u1")), lit(chunks))
      val paths = (0 until chunks).map { i =>
        val path = s"$dir/chunk_$i"
        aggOf(a.filter(route === i))
          .write.mode("overwrite").parquet(path)
        path
      }
      counts.sparkSession.read.parquet(paths: _*)
    }
  }
}
