package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-ADC retrieval — the two-level ANN architecture of Jégou et al.
  * (PAMI'11) composed from the engine's existing integer-exact pieces:
  * a COARSE quantizer ([[QuantizedKMeans]] centroids) partitions the
  * corpus into inverted lists, each query probes only its `nprobe`
  * nearest lists, and [[ProductQuantization]] ADC ranks the surviving
  * candidates from a broadcast integer distance table.
  *
  * This is the architecture that makes billion-vector ANN tractable:
  * brute force (q50) scores corpus × dims per query, flat ADC (q223)
  * scores corpus × m table lookups, IVF-ADC scores
  * (corpus × nprobe / coarseK) × m — the probed fraction of the
  * compressed domain. Both levels stay on the int8 exactness
  * discipline, so list assignment, probe selection, codes, and every
  * ADC sum are hash-verifiable cross-engine (q231 replays the whole
  * stack); recall is a function of the probe width, measured in
  * IvfAdcSpec against the q50 brute-force baseline.
  *
  * Scale shape (100 TB): centroids and codebooks broadcast
  * (coarseK + m×pqK rows); corpus vectors are touched once each for
  * assignment and encoding (map-side, centroid/codebook broadcasts);
  * the per-query work after pruning is bounded by the probed lists'
  * membership, and the only corpus-wide shuffles key on id. On a real
  * deployment the (cluster_id → members) frame is the partition/bucket
  * layout, making a probe a partition-pruned scan.
  */
object IvfAdc {

  /** `(qid, rank, idCol, adc_d2)`: top-k by ADC among each query's
    * `nprobe` nearest inverted lists. `corpus`/`queries` carry the
    * [[VectorQuantization.quantizeInt8]] columns (`idCol`, `q8`,
    * `qnorm2`). Coarse centroids are the deterministic seed discipline
    * (`coarseK` lowest-id corpus vectors — [[QuantizedKMeans.fit]]'s
    * Lloyd refinement composes when callers pre-train and pass their
    * own assignment instead). */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      qidCol: String, idCol: String,
      coarseK: Int, nprobe: Int, m: Int, pqK: Int, k: Int): DataFrame = {
    require(coarseK >= 1, s"coarseK must be >= 1, got $coarseK")
    require(nprobe >= 1 && nprobe <= coarseK,
      s"nprobe must be in [1, coarseK], got $nprobe")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cents = QuantizedKMeans.seedCentroids(corpus, idCol, coarseK)
    val members = QuantizedKMeans.assign(corpus, cents, idCol)
      .select(col(idCol), col("cluster_id"))
    val books = ProductQuantization.codebooks(
      corpus.select(col(idCol), col("q8")), idCol, m, pqK)
    val enc = ProductQuantization.encode(
      corpus.select(col(idCol), col("q8")), books, idCol, m)
    // probe selection: every query scores the (broadcast) centroid set
    // and keeps its nprobe nearest lists — coarseK rows per query, cut
    // by one window over that bounded frame
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("cd2"), col("cluster_id"))
    val probes = queries
      .select(col(qidCol).as("qid"), col("q8"), col("qnorm2"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("cluster_id"),
        (col("qnorm2") + col("cnorm2") - lit(2L) *
          VectorQuantization.int8DotFast(col("q8"), col("c8")))
          .as("cd2"))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobe)
      .select(col("qid"), col("cluster_id"))
    val cands = probes.join(members, Seq("cluster_id"))
      .select(col("qid"), col(idCol))
    ProductQuantization.adcTopKAmong(
      queries.select(col(qidCol), col("q8")), qidCol, books, enc,
      idCol, m, k, cands)
  }
}
