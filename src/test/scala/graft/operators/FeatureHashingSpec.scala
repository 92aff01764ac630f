package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[FeatureHashing.hashFeatures]] — cell-level agreement with an
  * independent JVM md5 recomputation, the zero-sum drop, and the
  * sign hash's zero-mean property. */
class FeatureHashingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def expected(
      toks: Seq[(Long, String)], hexChars: Int): Map[(Long, String), Long] =
    toks.groupBy { case (doc, tok) =>
      (doc, md5hex(tok + ":fh").substring(0, hexChars))
    }.view.mapValues(_.map { case (_, tok) =>
      if (md5hex(tok + ":fh").charAt(hexChars) < '8') 1L else -1L
    }.sum).filter(_._2 != 0L).toMap

  test("every (doc, bucket, weight) cell matches an independent md5 " +
    "recomputation; zero-sum collisions are dropped") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val toks = Seq.tabulate(3000)(i =>
      ((i % 7).toLong, s"w${rnd.nextInt(300)}"))
    val got = FeatureHashing.hashFeatures(
      toks.toDF("doc_id", "tok"), col("doc_id"), col("tok"), hexChars = 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected(toks, hexChars = 1))
  }

  test("sign hash is ~zero-mean: a large token set's global weight sum " +
    "is near zero relative to token count") {
    import spark.implicits._
    val toks = (1 to 20000).map(i => (1L, s"tok$i"))
    val total = FeatureHashing.hashFeatures(
      toks.toDF("doc_id", "tok"), col("doc_id"), col("tok"), hexChars = 2)
      .agg(sum(col("weight"))).collect()(0).getLong(0)
    // binomial: |sum| ~ sqrt(n) ≈ 141; 5 sigma ≈ 707
    assert(math.abs(total) < 707, s"sign bias: $total over 20000 tokens")
  }

  test("map-only determinism: identical output at any partitioning") {
    import spark.implicits._
    val toks = Seq.tabulate(500)(i => ((i % 5).toLong, s"t${i % 37}"))
    def run(parts: Int) = FeatureHashing.hashFeatures(
      toks.toDF("doc_id", "tok").repartition(parts),
      col("doc_id"), col("tok"), hexChars = 2)
      .orderBy(col("doc"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(run(1) === run(8))
  }
}
