package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.CorpusDiff

/** Corpus version diff: all four verdicts, null-content handling, and
  * fingerprint-vs-exact equality.
  */
class CorpusDiffSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val old = Seq(
      (1L, Option("alpha")), (2L, Option("beta")), (3L, Option("gamma")),
      (4L, Option.empty[String]), (5L, Option.empty[String]))
      .toDF("id", "c")
    val neu = Seq(
      (1L, Option("alpha")),      // unchanged
      (2L, Option("beta2")),      // changed
      // 3 removed
      (4L, Option.empty[String]), // unchanged (null <=> null)
      (5L, Option("now-set")),    // changed (null -> value)
      (9L, Option("fresh")))      // added
      .toDF("id", "c")
    (old, neu)
  }

  test("diff: all four verdicts incl. null-content semantics") {
    val (old, neu) = fixture
    val got = CorpusDiff.diff(old, neu, "id", col("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 9L -> "added"), s"$got")
    val sum = CorpusDiff.summary(old, neu, "id", col("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("fingerprint path agrees with exact compare on the real corpus") {
    val docs = spark.read.parquet(s"${sf("")}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val next = docs.filter(col("doc_id") % 3 =!= 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" !"))).otherwise(col("text")))
    val exact = CorpusDiff.diff(docs, next, "doc_id", col("text"))
    val fp = CorpusDiff.diff(docs, next, "doc_id", col("text"),
      fingerprint = true)
    assert(fp.exceptAll(exact).isEmpty && exact.exceptAll(fp).isEmpty)
  }

  test("multi-column diff via struct content") {
    import spark.implicits._
    val old = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "s", "v")
    val neu = Seq((1L, "a", 10), (2L, "b", 21)).toDF("id", "s", "v")
    val got = CorpusDiff.diff(old, neu, "id", struct(col("s"), col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }
}
