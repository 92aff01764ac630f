package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.BigramFamiliarity

/** The production bigram-familiarity paths vs the oracled string-keyed
  * shape (q174): the hash-keyed variant must score IDENTICALLY; the
  * broadcast-top-K variant must realize exactly its declared
  * approximation (head exact, tail = 1) with a deterministic boundary.
  */
class BigramFamiliaritySpec extends SparkSpec {

  /** The q174 string-keyed reference, inlined. */
  private def stringScores(docs: org.apache.spark.sql.DataFrame) = {
    val occ = BigramFamiliarity.bigrams(docs, "doc_id", "text")
    val counts = occ.groupBy(col("bigram"))
      .agg(count(lit(1)).as("bg_count"))
    occ.join(counts, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bg_count")).as("familiar_sum"))
      .withColumn("score", col("familiar_sum") / col("n_bigrams"))
  }

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "the dog sat on the mat"),
      (4L, "zx qv"),              // one unique bigram
      (5L, "single"),             // <2 tokens: absent from output
      (6L, ""),                   // empty: absent
      (7L, "the cat  sat"),       // double space: empty token dropped
      (8L, "on the cat sat on the"))
      .toDF("doc_id", "text")
  }

  test("hashed scores equal string-keyed scores exactly (fixture)") {
    val s = stringScores(fixture)
    val h = BigramFamiliarity.scoreHashed(fixture, "doc_id", "text")
    assert(h.exceptAll(s).isEmpty && s.exceptAll(h).isEmpty)
    // docs with <2 tokens are absent from both
    assert(h.filter(col("doc_id").isin(5L, 6L)).count() == 0)
  }

  test("hashed scores equal string-keyed scores on the real corpus") {
    val docs = spark.read.parquet(s"${sf("")}/documents.parquet")
    val s = stringScores(docs)
    val h = BigramFamiliarity.scoreHashed(docs, "doc_id", "text")
    assert(h.exceptAll(s).isEmpty && s.exceptAll(h).isEmpty)
  }

  test("top-K realizes head-exact/tail-1 semantics deterministically") {
    import spark.implicits._
    // corpus counts: "on the" 5; "cat sat"/"sat on"/"the cat" 4 each;
    // "the mat" 2; rest 1. k=2 → the count-4 three-way tie at the
    // boundary is broken by bigram string asc: "cat sat" wins.
    // top-2 = {"on the": 5, "cat sat": 4}; every other bigram counts 1.
    val got = BigramFamiliarity.scoreTopK(fixture, "doc_id", "text", k = 2)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_bigrams"), col("familiar_sum"))
      .as[(Long, Long, Long)].collect()
    val expected = Map(
      1L -> (5L, 1L + 4L + 1L + 5L + 1L),   // the-cat cat-sat sat-on on-the the-mat
      2L -> (5L, 1L + 4L + 1L + 5L + 1L),   // ... the-hat
      3L -> (5L, 1L + 1L + 1L + 5L + 1L),   // the-dog dog-sat sat-on on-the the-mat
      4L -> (1L, 1L),
      7L -> (2L, 1L + 4L),                   // the-cat cat-sat
      8L -> (5L, 5L + 1L + 4L + 1L + 5L))   // on-the the-cat cat-sat sat-on on-the
    assert(got.length == expected.size)
    got.foreach { case (id, n, fs) =>
      assert(expected(id) == ((n, fs)), s"doc $id: ($n,$fs)")
    }
  }

  test("top-K scoring join is a broadcast — doc side enters no exchange") {
    val docs = spark.read.parquet(s"${sf("")}/documents.parquet")
    val plan = BigramFamiliarity.scoreTopK(docs, "doc_id", "text", k = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
