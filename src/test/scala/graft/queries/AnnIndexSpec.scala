package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.AnnIndex

/** Incremental ANN index: append = full rebuild, probes find planted
  * neighbours, bucket pruning bounds candidates, guards. */
class AnnIndexSpec extends SparkSpec {

  private def planes = {
    import spark.implicits._
    Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("pid", "pv")
  }

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("appended index rows equal a full rebuild") {
    GraftFunctions.register(spark)
    val corpus = emb(10L -> Seq(3f, 1f), 11L -> Seq(-2f, 4f))
    val batch = emb(12L -> Seq(2f, 2f), 13L -> Seq(-1f, -1f))
    val whole = emb(10L -> Seq(3f, 1f), 11L -> Seq(-2f, 4f),
      12L -> Seq(2f, 2f), 13L -> Seq(-1f, -1f))
    def rows(df: org.apache.spark.sql.DataFrame) =
      AnnIndex.indexRows(df, "vec_id", "embedding", planes)
        .select(col("vec_id"), col("bucket"), col("qnorm2"))
        .collect().map(_.toString).sorted.toSeq
    assert((rows(corpus) ++ rows(batch)).sorted == rows(whole),
      "incremental append must equal indexing everything at once")
  }

  test("probe finds the planted same-bucket neighbour, never cross-bucket") {
    GraftFunctions.register(spark)
    // bucket = sign bits against x/y axes: (+,+) -> 3, (-,+) -> 2
    val index = AnnIndex.indexRows(emb(
      20L -> Seq(10f, 9f),   // bucket 3 — the planted near neighbour
      21L -> Seq(9f, 10f),   // bucket 3
      22L -> Seq(-10f, 9f)), // bucket 2 — closest by angle to nothing here
      "vec_id", "embedding", planes)
    val probes = AnnIndex.indexRows(emb(0L -> Seq(10f, 10f)),
      "vec_id", "embedding", planes)
    val got = AnnIndex.topK(index, probes, k = 10)
      .select("qid", "rank", "vid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // only bucket-3 rows are candidates; 22 is pruned out
    assert(got.map(_._3).toSet == Set(20L, 21L))
    assert(got.size == 2)
    intercept[IllegalArgumentException](AnnIndex.topK(index, probes, 0))
  }
}
