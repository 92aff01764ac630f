package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-duplicate tests for MinHash+LSH and SimHash: exact semantics on
  * corpora where the right answer is known by construction. */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val baseText = (1 to 60).map(i => s"tok$i").mkString(" ")
  // 90%-overlapping variant: last 6 tokens replaced
  private val nearText = ((1 to 54).map(i => s"tok$i") ++
    (1 to 6).map(i => s"other$i")).mkString(" ")
  // unrelated text, disjoint vocabulary
  private val farText = (1 to 60).map(i => s"zzz$i").mkString(" ")

  test("MinHash finds planted near-duplicate, skips unrelated doc") {
    val d = docs(1L -> baseText, 2L -> nearText, 3L -> farText)
    val pairs = MinHash.nearDuplicates(d, "doc_id", "text",
      shingleLen = 3, numPerms = 32, bands = 8, threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val j = pairs.head.getAs[Double]("jaccard")
    // 52 shared 3-shingles of 58 each → jaccard 52/64
    assert(j > 0.7 && j < 0.9, s"jaccard $j")
  }

  test("MinHash exact duplicate has jaccard 1.0") {
    val d = docs(1L -> baseText, 2L -> baseText)
    val pairs = MinHash.nearDuplicates(d, "doc_id", "text", threshold = 0.99)
      .collect()
    assert(pairs.length == 1 && pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("SimHash: identical docs at hamming 0, near docs within bound, far docs out") {
    val d = docs(1L -> baseText, 2L -> baseText, 3L -> farText)
    val fps = SimHash.fingerprints(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L), "identical text → identical fingerprint")
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > 10,
      "disjoint vocab → distant fingerprints")
    val pairs = SimHash.nearDuplicates(d, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("LSH bucket bound drops degenerate buckets instead of exploding") {
    // 50 identical docs → one bucket of 50; cap at 10 suppresses the
    // quadratic blowup and yields no candidates
    val d = docs((1L to 50L).map(i => i -> baseText): _*)
    val sh = MinHash.shingles(d, "doc_id", "text", 3)
    val sigs = MinHash.signatures(sh, "doc_id", 32)
    val cands = MinHash.candidates(sigs, "doc_id", 32, 8, maxBucketSize = 10)
    assert(cands.count() == 0)
  }
}
