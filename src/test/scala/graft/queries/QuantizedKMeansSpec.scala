package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{QuantizedKMeans, VectorQuantization}

/** Quantized k-means: known-fixture assignment, Lloyd improvement,
  * empty-cluster survival, guards. */
class QuantizedKMeansSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("assignment: two obvious blobs split on the seed centroids") {
    // ids 0,1 seed the centroids; 2,3 sit next to 0, 4,5 next to 1
    val e = emb(
      0L -> Seq(10f, 0f), 1L -> Seq(0f, 10f),
      2L -> Seq(9f, 1f), 3L -> Seq(8f, 0f),
      4L -> Seq(1f, 9f), 5L -> Seq(0f, 8f))
    val q = VectorQuantization.quantizeInt8(e, "embedding")
      .select(col("vec_id"), col("q8"), col("qnorm2"))
    val cents = QuantizedKMeans.seedCentroids(q, "vec_id", k = 2)
    val got = QuantizedKMeans.assign(q, cents, "vec_id")
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L))
    // seeds are at distance 0 from themselves
    val self = QuantizedKMeans.assign(q, cents, "vec_id")
      .filter(col("vec_id") === col("cluster_id"))
      .select("qd2").collect().map(_.getLong(0))
    assert(self.forall(_ == 0L))
  }

  test("ties break toward the lowest cluster id") {
    // vector 2 is equidistant from both seeds
    val e = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(1f, 1f))
    val q = VectorQuantization.quantizeInt8(e, "embedding")
      .select(col("vec_id"), col("q8"), col("qnorm2"))
    val cents = QuantizedKMeans.seedCentroids(q, "vec_id", k = 2)
    val got = QuantizedKMeans.assign(q, cents, "vec_id")
      .filter(col("vec_id") === 2)
      .select("cluster_id").collect().map(_.getLong(0))
    assert(got.sameElements(Array(0L)))
  }

  test("lloyd iterations do not worsen the integer objective") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0L until 60L).map { i =>
      val cx = if (i % 3 == 0) 50f else if (i % 3 == 1) -50f else 0f
      val cy = if (i % 3 == 2) 60f else 0f
      (i, Seq(cx + rnd.nextInt(9) - 4, cy + rnd.nextInt(9) - 4))
    }
    val e = pts.toDF("vec_id", "embedding")
    def objective(iters: Int): Long =
      QuantizedKMeans.fit(e, "vec_id", "embedding", k = 3, iters = iters)
        .agg(sum(col("qd2"))).collect()(0).getLong(0)
    val o1 = objective(1)
    val o3 = objective(3)
    assert(o3 <= o1, s"objective rose: $o1 -> $o3")
  }

  test("empty clusters keep their centroid; guards reject bad input") {
    val e = emb(0L -> Seq(1f, 1f), 1L -> Seq(100f, 100f),
      2L -> Seq(99f, 99f), 3L -> Seq(98f, 98f))
    // seed 0 is isolated; after an update it may lose all members —
    // the fit must still produce a full assignment every iteration
    val fitted = QuantizedKMeans.fit(e, "vec_id", "embedding", 2, 3)
    assert(fitted.count() == 4)
    assert(fitted.select("cluster_id").distinct().count() <= 2)
    val q = VectorQuantization.quantizeInt8(e, "embedding")
      .select(col("vec_id"), col("q8"), col("qnorm2"))
    intercept[IllegalArgumentException](
      QuantizedKMeans.seedCentroids(q, "vec_id", 0))
    intercept[IllegalArgumentException](
      QuantizedKMeans.assign(q.withColumn("qd2", lit(1L)),
        QuantizedKMeans.seedCentroids(q, "vec_id", 1), "vec_id"))
    intercept[IllegalArgumentException](
      QuantizedKMeans.fit(e, "vec_id", "embedding", 2, 0))
  }
}
