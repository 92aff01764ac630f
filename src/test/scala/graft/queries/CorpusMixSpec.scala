package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.SegmentDedup
import graft.operators.{SourceMix, SourceOverlap, Vocabulary}

/** Segment-level exact dedup, vocabulary/OOV scoring, deterministic
  * mixture realization, and the cross-source overlap matrix. */
class CorpusMixSpec extends SparkSpec {

  private def doc(id: Long, words: String*): (Long, String) =
    (id, words.mkString(" "))

  test("segment dedup: keep-first semantics on a planted fixture") {
    import spark.implicits._
    val a = (1 to 8).map(i => s"a$i") // segment A
    val b = (1 to 8).map(i => s"b$i") // segment B
    val c = (1 to 8).map(i => s"c$i") // segment C
    val docs = Seq(
      doc(0, a ++ b: _*),       // defines A and B
      doc(1, a ++ c: _*),       // A is a dup; C survives
      doc(2, a ++ b: _*),       // everything already seen → empty
      doc(3, c.take(3): _*))    // short trailing segment, first seen? no —
                                // "c1 c2 c3" ≠ full C, so it SURVIVES
      .toDF("doc_id", "text")
    val out = SegmentDedup.dedup(docs, "doc_id", "text", segTokens = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((0L, 2L, 2L, (a ++ b).mkString(" "))))
    assert(out(1) == ((1L, 2L, 1L, c.mkString(" "))))
    assert(out(2) == ((2L, 2L, 0L, "")))
    assert(out(3) == ((3L, 1L, 1L, c.take(3).mkString(" "))))
  }

  test("segment dedup: idempotent — a second pass removes nothing") {
    import spark.implicits._
    val words = Vector("x", "y", "z", "w")
    val docs = (0L until 40L).map { i =>
      (i, (0 until 24).map(j => words(((i * 7 + j * 3) % 4).toInt))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val once = SegmentDedup.dedup(docs, "doc_id", "text", 4)
      .select(col("doc_id"), col("kept_text").as("text"))
      .filter(col("text") =!= "")
    val twice = SegmentDedup.dedup(once, "doc_id", "text", 4)
    assert(twice.filter(col("n_kept") =!= col("n_segs")).count() == 0,
      "surviving segments are unique, so a re-run keeps everything")
    intercept[IllegalArgumentException](
      SegmentDedup.dedup(docs, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      SegmentDedup.dedup(docs.withColumn("n_kept", lit(1)),
        "doc_id", "text", 4))
  }

  test("vocabulary: deterministic tie-break and broadcast OOV scoring") {
    import spark.implicits._
    // counts: hot=4, warm=2, cold=2, rare=1 → top-2 = hot, cold (tie on
    // 2 between warm/cold breaks lexicographically: cold < warm)
    val docs = Seq(
      doc(0, "hot", "hot", "warm", "cold"),
      doc(1, "hot", "hot", "warm", "cold", "rare"))
      .toDF("doc_id", "text")
    val v = Vocabulary.build(docs, "text", n = 2)
      .select("word", "rank").as[(String, Int)].collect().toMap
    assert(v == Map("hot" -> 1, "cold" -> 2))

    val oov = Vocabulary.oovStats(docs, "doc_id", "text",
      Vocabulary.build(docs, "text", n = 2))
    val rows = oov.orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov")
      .as[(Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((0L, 4L, 1L), (1L, 5L, 2L)))
    // the corpus is scored via a broadcast join, never reshuffled
    val plan = oov.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast, got:\n$plan")
  }

  test("source mix: boundary document included, salt re-deals") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"g${i % 2}", 10L))
      .toDF("doc_id", "grp", "tok")
    // budget 35 at 10 tokens/doc → starts 0,10,20,30 accepted (the doc
    // STARTING inside the budget crosses it), start 40 rejected
    val out = SourceMix.fillToBudget(docs, "grp", "doc_id", col("tok"),
      budgets = Map("g0" -> 35L, "g1" -> 35L), salt = "s1")
    val perGroup = out.groupBy("grp").agg(
        count(lit(1)).as("n"), max("cum_start").as("last_start"))
      .as[(String, Long, Long)].collect()
      .map { case (g, n, l) => g -> ((n, l)) }.toMap
    assert(perGroup == Map("g0" -> ((4L, 30L)), "g1" -> ((4L, 30L))))

    // deterministic: same salt → same manifest; new salt → a re-deal
    val again = SourceMix.fillToBudget(docs, "grp", "doc_id", col("tok"),
      Map("g0" -> 35L, "g1" -> 35L), "s1").select("doc_id")
    assert(out.select("doc_id").except(again).count() == 0)
    val redeal = SourceMix.fillToBudget(docs, "grp", "doc_id", col("tok"),
      Map("g0" -> 35L, "g1" -> 35L), "s2").select("doc_id")
    assert(redeal.count() == 8)
    assert(out.select("doc_id").except(redeal).count() > 0,
      "a different salt should pick a different prefix")

    // groups without a budget drop out; zero budget accepts nothing
    val g0only = SourceMix.fillToBudget(docs, "grp", "doc_id", col("tok"),
      Map("g0" -> 35L), "s1")
    assert(g0only.filter(col("grp") === "g1").count() == 0)
    assert(SourceMix.fillToBudget(docs, "grp", "doc_id", col("tok"),
      Map("g0" -> 0L, "g1" -> 0L), "s1").count() == 0)
  }

  test("source overlap: set-based pair emission equals the naive join") {
    import spark.implicits._
    val words = Vector("p", "q", "r", "s", "t", "u")
    val docs = (0L until 60L).map { i =>
      (i, s"src${i % 5}",
        (0 until 12).map(j => words(((i * 5 + j * 7) % 6).toInt))
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
    val fast = SourceOverlap.matrix(docs, "source", "text", n = 3)
      .select("src_a", "src_b", "n_shared", "containment")

    val sh = SourceOverlap.shingles(docs, "source", "text", 3)
    val naive = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    val szs = sh.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val naiveFull = naive.as[(String, String, Long)].collect().map {
      case (a, b, shared) =>
        (a, b, shared, shared.toDouble / math.min(szs(a), szs(b)))
    }.toSet
    val fastSet = fast.as[(String, String, Long, Double)].collect().toSet
    assert(fastSet == naiveFull,
      "collect_set pair expansion must equal the quadratic self-join")
    assert(fastSet.nonEmpty)
    // containment is a proper coefficient
    assert(fastSet.forall { case (_, _, _, c) => c > 0.0 && c <= 1.0 })
  }
}
