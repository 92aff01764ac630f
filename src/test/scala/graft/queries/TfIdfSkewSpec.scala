package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{SkewReport, TfIdf}

/** TF-IDF keyword extraction and the key-skew diagnostic: hand-computed
  * fixtures, determinism of tie-breaks, and the plan shapes that matter
  * at scale (no global sort for top-N, no single-partition window over
  * the key space).
  */
class TfIdfSkewSpec extends SparkSpec {

  test("tf-idf: hand-computed scores, ranks, and tie-breaks") {
    import spark.implicits._
    // N = 3. df: the=3, cat=2, dog=1, mat=2, sat=2
    val docs = Seq(
      (1L, "the cat sat the"),   // tf(the)=2
      (2L, "the cat mat"),
      (3L, "the dog mat sat"))
      .toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy(col("doc_id"), col("term_rank"))
      .select(col("doc_id"), col("term"), col("score"))
      .as[(Long, String, Double)].collect()
    // doc 1: the 2*3/3=2.0, cat 1*3/2=1.5, sat 1.5 -> cat wins tie by term
    // doc 2: cat 1.5, mat 1.5, the 1.0 -> cat, mat
    // doc 3: dog 1*3/1=3.0, mat 1.5, sat 1.5 -> dog, mat
    assert(got.toSeq == Seq(
      (1L, "the", 2.0), (1L, "cat", 1.5),
      (2L, "cat", 1.5), (2L, "mat", 1.5),
      (3L, "dog", 3.0), (3L, "mat", 1.5)))
  }

  test("tf-idf: empty docs absent, k bounds output per doc") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, ""), (3L, "  "))
      .toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 3)
    assert(got.select(col("doc_id")).distinct()
      .as[Long].collect().toSeq == Seq(1L))
    assert(got.count() == 3)
    intercept[IllegalArgumentException] {
      TfIdf.topTerms(docs, "doc_id", "text", k = 0)
    }
  }

  test("skew report: counts, shares, vs_mean, null key surfaces") {
    import spark.implicits._
    val df = (Seq.fill(6)(Option(7L)) ++ Seq.fill(3)(Option(8L)) ++
      Seq(Option(9L), Option.empty[Long], Option.empty[Long]))
      .toDF("k")
    val got = SkewReport.topKeys(df, "k", topN = 3)
      .orderBy(col("key_rank"))
      .select(col("key"), col("cnt"), col("share"), col("vs_mean"))
      .collect()
    // 12 rows, 4 keys (incl. null), mean load 3
    assert(got(0).getString(0) == "7" && got(0).getLong(1) == 6 &&
      got(0).getDouble(2) == 0.5 && got(0).getDouble(3) == 2.0)
    assert(got(1).getString(0) == "8" && got(1).getLong(1) == 3 &&
      got(1).getDouble(3) == 1.0)
    // null key (2 rows) outranks key 9 (1 row) — hidden hot keys surface
    assert(got(2).isNullAt(0) && got(2).getLong(1) == 2)
  }

  test("skew top-N is TakeOrdered, not a global sort or key-space window") {
    val ev = spark.read.parquet(s"${sf("")}/events.parquet")
    val plan = SkewReport.topKeys(ev, "user_id", topN = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
