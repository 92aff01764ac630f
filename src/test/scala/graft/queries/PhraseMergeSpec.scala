package graft.queries

import graft.SparkSpec
import graft.operators.PhraseMerge

class PhraseMergeSpec extends SparkSpec {
  import spark.implicits._

  // threshold 1/1: qualify iff (n_ab − δ) ≥ n_a·n_b — impossible for
  // real counts, so tests pass explicit generous thresholds instead
  private def merge(docs: Seq[(Long, String)], discount: Long = 0L,
      num: Long = 1L, den: Long = 1000000L) =
    PhraseMerge.mergeOnce(docs.toDF("doc_id", "text"), "doc_id", "text",
      discount, num, den)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

  test("qualifying pair merges leftmost-non-overlapping, " +
    "odd-run chains keep the dangling token") {
    // discount 1 kills the singleton pairs (b,a)/(a,c) — the δ's job —
    // leaving only (a,a): "a a a a a" → "a_a a_a a" (2 merges)
    val got = merge(Seq(1L -> "a a a a a", 2L -> "b a a c"),
      discount = 1L, num = 1L, den = 13L)
    assert(got(1L) == (1L, 5L, 2L, 3L, "a_a a_a a"))
    assert(got(2L) == (2L, 4L, 1L, 3L, "b a_a c"))
  }

  test("non-qualifying corpus passes through unchanged; empty doc safe") {
    val got = merge(Seq(1L -> "x y z", 2L -> ""),
      num = 1000000L, den = 1L) // threshold no pair can meet
    assert(got(1L) == (1L, 3L, 0L, 3L, "x y z"))
    assert(got(2L) == (2L, 0L, 0L, 0L, ""))
  }

  test("distinct qualifying pairs merge independently; counts exact") {
    val docs = Seq(1L -> "u v u v w", 2L -> "u v", 3L -> "v u")
    val ph = PhraseMerge.phrases(docs.toDF("doc_id", "text"),
        "doc_id", "text", 0L, 1L, 1000000L)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // u appears 4×, v 4×; (u,v) adjacent 3×, (v,u) 2×, (v,w) 1×
    assert(ph(("u", "v")) == (3L, 4L, 4L))
    assert(ph(("v", "u")) == (2L, 4L, 4L))
    val got = merge(docs)
    // "u v u v w": (u,v) at pos 0 and 2 merge (non-consecutive runs),
    // (v,u) at pos 1 is consumed by the pos-0 merge; (v,w) qualifies
    // at this threshold too but pos-3 v is inside the second u_v merge
    assert(got(1L)._5 == "u_v u_v w")
    assert(got(3L)._5 == "v_u")
  }

  test("guards reject bad parameters") {
    val d = Seq(1L -> "a b").toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      PhraseMerge.phrases(d, "doc_id", "text", -1L, 1L, 1L))
    intercept[IllegalArgumentException](
      PhraseMerge.phrases(d, "doc_id", "text", 0L, 0L, 1L))
  }
}
