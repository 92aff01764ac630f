package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[RandomProjection.project]] — independent-impl replay of the
  * fixed-order chains, the JL distance-preservation envelope, and
  * sign-matrix balance. */
class RandomProjectionSpec extends SparkSpec {

  private val d = 32
  private val k = 8

  private val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(97)
    (0L until 60L).map(i =>
      (i, Seq.fill(d)(rnd.nextFloat() * 2f - 1f)))
  }

  private def signOf(j: Int, kk: Int): Int = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    val h = mdi.digest(s"rp:$j:$kk:g".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }

  private def bruteProject(v: Seq[Float]): Seq[Double] =
    (0 until k).map { kk =>
      var acc = 0.0
      (0 until d).foreach { j =>
        val t = v(j).toDouble
        acc = if (signOf(j, kk) > 0) acc + t else acc - t
      }
      acc / math.sqrt(k.toDouble)
    }

  test("projections replay BIT-EXACTLY in an independent fixed-order " +
    "implementation") {
    import spark.implicits._
    val got = RandomProjection.project(
      vecs.toDF("id", "v").repartition(5), col("v"), d, k)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (0 until k).map(kk => r.getAs[Double](s"p$kk")))
      .toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === bruteProject(v), s"vec $id")
    }
  }

  test("pairwise squared distances are preserved within the JL " +
    "envelope on average") {
    val projected = vecs.map { case (id, v) => id -> bruteProject(v) }
      .toMap
    val orig = vecs.toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0L until 30L; j <- (i + 1) until 30L
    } yield {
      val o = d2(orig(i).map(_.toDouble), orig(j).map(_.toDouble))
      val p = d2(projected(i), projected(j))
      p / o
    }
    val mean = ratios.sum / ratios.size
    // E[ratio] = 1; with k=8 individual ratios are noisy but the mean
    // over 435 pairs concentrates
    assert(mean > 0.8 && mean < 1.2, s"mean distance ratio $mean")
    assert(ratios.count(r => r > 0.2 && r < 3.0) > ratios.size * 9 / 10)
  }

  test("the sign matrix is roughly balanced per output dimension") {
    (0 until k).foreach { kk =>
      val pos = (0 until d).count(j => signOf(j, kk) > 0)
      assert(pos >= d / 4 && pos <= 3 * d / 4, s"dim $kk: $pos positive")
    }
  }
}
