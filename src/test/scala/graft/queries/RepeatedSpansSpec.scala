package graft.queries

import graft.SparkSpec
import graft.operators.RepeatedSpans

class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int) =
    RepeatedSpans.mask(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  // brute-force reference: mask every position covered by a k-window
  // whose token string occurred earlier in (doc, pos) order
  private def brute(docs: Seq[(Long, String)], k: Int) = {
    val toks = docs.sortBy(_._1).map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val seen = scala.collection.mutable.Set[String]()
    val masked = scala.collection.mutable.Map[Long, Set[Int]]()
    for ((id, ts) <- toks; i <- 0 to ts.size - k) {
      val g = ts.slice(i, i + k).mkString(" ")
      if (seen(g))
        masked(id) = masked.getOrElse(id, Set.empty) ++ (i until i + k)
      else seen += g
    }
    toks.map { case (id, ts) =>
      val m = masked.getOrElse(id, Set.empty)
      val spans = if (m.isEmpty) 0
        else m.toSeq.sorted.foldLeft((0, -2)) { case ((n, prev), p) =>
          (if (p == prev + 1) n else n + 1, p) }._1
      (id, ts.size.toLong, m.size.toLong, spans.toLong,
        ts.indices.filterNot(m).map(ts).mkString(" "))
    }
  }

  test("straddling repeats mask, first occurrence survives, overlapping " +
    "windows merge to one span, full-dup doc empties") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "z a b c d w"), // repeat sits at offset 1 — the straddle case
      (3L, "a b c"),       // entire doc is an earlier gram
      (4L, "q r s"),       // untouched
      (5L, ""))            // empty doc passes through
    val got = run(docs, 3)
    assert(got.toSeq === brute(docs, 3))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) === ((1L, 5L, 0L, 0L, "a b c d e")))
    // doc2: windows at pos 2 and 3 duplicate -> cover {2..5}, ONE span
    assert(byId(2L) === ((2L, 6L, 4L, 1L, "z w")))
    assert(byId(3L) === ((3L, 3L, 3L, 1L, "")))
    assert(byId(4L) === ((4L, 3L, 0L, 0L, "q r s")))
    assert(byId(5L) === ((5L, 0L, 0L, 0L, "")))
  }

  test("within-document repeats mask their later occurrences too") {
    val docs = Seq((1L, "a b c x a b c"))
    val got = run(docs, 3)
    assert(got.toSeq === brute(docs, 3))
    // positions 5..7 masked (the second "a b c"), first copy + x survive
    assert(got.head === ((1L, 7L, 3L, 1L, "a b c x")))
  }

  test("randomized differential against the quadratic reference") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "b", "c", "d")
    val docs = (1L to 12L).map(i =>
      i -> Seq.fill(rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    for (k <- Seq(2, 3, 4))
      assert(run(docs, k).toSeq === brute(docs, k), s"k=$k")
  }

  test("guards") {
    intercept[IllegalArgumentException](
      RepeatedSpans.mask(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", k = 1))
  }
}
