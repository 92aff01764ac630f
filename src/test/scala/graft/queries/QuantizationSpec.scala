package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.VectorQuantization._

/** Int8 scalar quantization: exact code math on known vectors, safe
  * degenerate cases, and ranking agreement with the float-exact path on a
  * separable fixture. */
class QuantizationSpec extends SparkSpec {

  test("codes, norms, and integer dots are exact on known vectors") {
    import spark.implicits._
    // max|x| = 2.0 → scale 63.5: [2, 1, -2] → [127, 64, -127]
    //                            [0.5, 2, 0] → [32, 127, 0]
    val df = Seq(
      (1L, Seq(2.0f, 1.0f, -2.0f)),
      (2L, Seq(0.5f, 2.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f))) // zero vector must not divide by zero
      .toDF("vec_id", "embedding")
    val q = quantizeInt8(df, "embedding")
      .select("vec_id", "q8", "qnorm2").as[(Long, Seq[Int], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(q(1L)._1 == Seq(127, 64, -127))
    assert(q(1L)._2 == 127L * 127 + 64L * 64 + 127L * 127)
    assert(q(2L)._1 == Seq(32, 127, 0))
    assert(q(3L)._1 == Seq(0, 0, 0) && q(3L)._2 == 0L)

    val dot = quantizeInt8(df, "embedding")
      .filter(col("vec_id") === 1)
      .select(int8Dot(col("q8"), col("q8")).as("d"))
      .collect()(0).getLong(0)
    assert(dot == q(1L)._2, "int8Dot is the exact integer dot")
  }

  test("quantized ranking agrees with exact cosine on separated clusters") {
    import spark.implicits._
    // two well-separated directions; quantization noise (~1/127) cannot
    // flip a ranking between them
    val mk = (base: Seq[Float], eps: Float, at: Int) =>
      base.zipWithIndex.map { case (v, i) => if (i == at) v + eps else v }
    val a = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq(
      (0L, a), (1L, mk(a, 0.05f, 1)), (2L, mk(a, 0.1f, 2)),
      (3L, b), (4L, mk(b, 0.05f, 0)))
      .toDF("vec_id", "embedding")
    val q = quantizeInt8(df, "embedding")
    val queries = q.filter(col("vec_id") === 0)
      .select(col("q8").as("qa"), col("qnorm2").as("na"))
    val scored = broadcast(queries)
      .join(q.filter(col("vec_id") =!= 0), lit(true))
      .withColumn("qcos", quantizedCosine(
        int8Dot(col("qa"), col("q8")), col("na"), col("qnorm2")))
      .orderBy(col("qcos").desc)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(scored.take(2).toSet == Set(1L, 2L),
      s"the a-cluster outranks the b-cluster, got $scored")
    assert(scored.drop(2).toSet == Set(3L, 4L))
  }

  test("codegen quantize equals the declarative reference, dot for dot") {
    import spark.implicits._
    import graft.operators.VectorQuantization._
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 300L).map { i =>
      val dim = 1 + (i % 7).toInt * 9
      (i, Seq.fill(dim)((rnd.nextFloat() - 0.5f) * (1 << rnd.nextInt(12))))
    } ++ Seq(
      300L -> Seq(0f, 0f, 0f),      // zero vector
      301L -> Seq.empty[Float],     // empty array
      302L -> Seq(-2.5f, 2.5f, 5f)) // exact .5 boundaries after scaling
    val df = vecs.toDF("vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("vec_id", "q8", "qnorm2").collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    val fast = rows(quantizeInt8(df, "embedding"))
    val ref = rows(quantizeInt8Declarative(df, "embedding"))
    assert(fast.keySet == ref.keySet)
    fast.foreach { case (id, (codes, n2)) =>
      assert(codes == ref(id)._1, s"vec $id codes differ")
      assert(n2 == ref(id)._2, s"vec $id norms differ")
    }
    // the fast integer dot equals the interpreted one on the same codes
    val q = quantizeInt8(df, "embedding")
    val both = q.filter(col("vec_id") < 100)
      .select(int8Dot(col("q8"), col("q8")).as("slow"),
        int8DotFast(col("q8"), col("q8")).as("fast"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
