package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{SequencePacking, StratifiedSample}

/** Corpus-curation operators: token-budget sequence packing and
  * deterministic stratified sampling. */
class CorpusOpsSpec extends SparkSpec {

  test("offset packing: known fixture bins, bounded straddle overflow") {
    import spark.implicits._
    // one shard → the layout is fully determined by id order:
    // tokens 6,3,4,2 at budget 8 → starts 0,6,9,13 → packs 0,0,1,1
    val docs = Seq((0L, 6L), (1L, 3L), (2L, 4L), (3L, 2L))
      .toDF("doc_id", "tok")
    val packed = SequencePacking.pack(
        docs, "doc_id", col("tok"), budget = 8L, shards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(packed == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))

    // overflow bound: pack 0 holds 6+3=9 tokens — over budget by 1,
    // which is < the straddling member's 3 tokens (the documented bound)
    val m = SequencePacking.manifest(
        docs, "doc_id", col("tok"), budget = 8L, shards = 1)
      .select("pack_id", "pack_tokens").as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 9L, 1L -> 6L))
  }

  test("packing shards are independent and every doc lands exactly once") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, 1L + i % 7)).toDF("doc_id", "tok")
    val packed = SequencePacking.pack(
      docs, "doc_id", col("tok"), budget = 16L, shards = 4)
    assert(packed.count() == 200, "packing is an assignment, not a filter")
    assert(packed.select("doc_id").distinct().count() == 200)
    assert(packed.select("shard").distinct().count() == 4)
    // within every shard, pack ids are dense from 0 and token starts are
    // consistent with the running sum (replay check)
    val byShard = packed.groupBy("shard")
      .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
        countDistinct("pack_id").as("n"))
      .as[(Long, Long, Long, Long)].collect()
    byShard.foreach { case (_, lo, hi, n) =>
      assert(lo == 0L && n == hi + 1, "pack ids dense per shard")
    }
    intercept[IllegalArgumentException](
      SequencePacking.pack(docs, "doc_id", col("tok"), 0L, 4))
    intercept[IllegalArgumentException](
      SequencePacking.pack(docs, "doc_id", col("tok"), 16L, 0))
  }

  test("stratified sample: exact k per stratum, deterministic, capped") {
    import spark.implicits._
    val docs = (0L until 90L)
      .map(i => (i, Seq("en", "fr", "de")(
        (i % 3L).toInt))).toDF("doc_id", "lang")
      .unionByName(Seq((900L, "rare")).toDF("doc_id", "lang"))
    val s1 = StratifiedSample.exactPerStratum(docs, "lang", "doc_id", k = 5)
    val counts = s1.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 5L, "fr" -> 5L, "de" -> 5L, "rare" -> 1L),
      "exactly k per stratum; undersized strata keep everything")
    // determinism: a second run picks the SAME docs
    val s2 = StratifiedSample.exactPerStratum(docs, "lang", "doc_id", k = 5)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("budgeted sample: per-stratum budgets, unbudgeted strata drop") {
    import spark.implicits._
    val docs = (0L until 60L)
      .map(i => (i, if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "lang")
    val out = StratifiedSample.budgeted(docs, "lang", "doc_id",
      Map("en" -> 7, "de" -> 3)) // fr unbudgeted, de absent from data
    val counts = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 7L), "fr dropped, de yields nothing")
    intercept[IllegalArgumentException](
      StratifiedSample.budgeted(docs, "lang", "doc_id", Map.empty))
    intercept[IllegalArgumentException](
      StratifiedSample.budgeted(docs, "lang", "doc_id", Map("en" -> -1)))
  }
}
