package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PhraseIterateSpec extends SparkSpec {

  // "a b" qualifies aggressively (discount 0, τ/N = 1/1000); in round 2
  // the merged unit "a_b" adjoins "c" often enough to qualify again, so
  // two rounds genuinely stack merges into "a_b_c"
  private def docs = {
    import spark.implicits._
    (1 to 30).map(i => (i.toLong, "a b c x" + i)) :+
      (31L, "") :+ (32L, "q r s")
  }

  test("iterate(2) equals mergeOnce composed with itself") {
    import spark.implicits._
    val d = docs.toDF("doc_id", "text")
    val (got, stats) = PhraseMerge.iterate(d, "doc_id", "text",
      discount = 0L, scoreNum = 1L, scoreDen = 1000L, maxRounds = 2)
    val r1 = PhraseMerge.mergeOnce(d, "doc_id", "text", 0L, 1L, 1000L)
    val r2 = PhraseMerge.mergeOnce(
      r1.select(col("doc_id"), col("new_text").as("text")),
      "doc_id", "text", 0L, 1L, 1000L)
    val want = r1.select(col("doc_id"), col("n_before"),
        col("n_merges").as("m1"))
      .join(r2.drop("n_before"), Seq("doc_id"))
      .select(col("doc_id"), col("n_before"),
        (col("m1") + col("n_merges")).as("n_merges"),
        col("n_after"), col("new_text"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.orderBy(col("doc_id")).collect().toSeq == want)
    assert(stats.length == 2 && stats.forall(_.merges > 0))
    // round 2 really stacked onto round 1's units
    assert(got.filter(col("new_text").contains("a_b_c")).count() == 30)
  }

  test("a zero-merge round is a fixed point that stops training early") {
    import spark.implicits._
    // every adjacent pair is unique → discount 5 disqualifies all
    val d = (1 to 5).map(i => (i.toLong, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val (out, stats) = PhraseMerge.iterate(d, "doc_id", "text",
      discount = 5L, scoreNum = 1L, scoreDen = 1000L, maxRounds = 4)
    assert(stats.length == 1 && stats.head.merges == 0L)
    assert(out.agg(sum(col("n_merges"))).head().getLong(0) == 0L)
  }

  test("vocabBudget stops once the rewritten vocabulary fits") {
    import spark.implicits._
    val d = docs.toDF("doc_id", "text")
    // round 1 vocab: a_b, c, x1..x30, q, r, s → well over 10; a budget
    // of 10000 is already met after round 1 → exactly one round runs
    val (_, stats) = PhraseMerge.iterate(d, "doc_id", "text",
      discount = 0L, scoreNum = 1L, scoreDen = 1000L, maxRounds = 5,
      vocabBudget = 10000L)
    assert(stats.length == 1)
    // with no budget the same corpus trains further
    val (_, statsFree) = PhraseMerge.iterate(d, "doc_id", "text",
      discount = 0L, scoreNum = 1L, scoreDen = 1000L, maxRounds = 5)
    assert(statsFree.length > 1)
  }
}
