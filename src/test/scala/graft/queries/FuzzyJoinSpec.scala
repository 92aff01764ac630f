package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= k
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int, q: Int = 2): Set[(Long, Long, Long)] =
    FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", k, q)
      .select($"a_id", $"b_id", $"dist").as[(Long, Long, Long)]
      .collect().toSet

  test("blocked join equals brute force on a mixed fixture") {
    val rows = Seq(
      1L -> "Customer#000000010", 2L -> "Customer#000000011",
      3L -> "Customer#000000110", 4L -> "Customer#000001010",
      5L -> "Custamer#000000010", 6L -> "Customer#00000001",
      7L -> "completely different", 8L -> "Customer#999999999")
    assert(run(rows, 1) == brute(rows, 1))
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("repeated-gram strings (the multiset trap) still match brute force") {
    // aaaa… runs collapse under set-of-grams blocking; the occurrence
    // numbering must keep them apart.
    val rows = Seq(
      1L -> "aaaaaaaaaa", 2L -> "aaaaaaaaab", 3L -> "aaaaabaaaa",
      4L -> "aaaaaaaaaa", 5L -> "bbbbbbbbbb", 6L -> "aaaaabbaaa")
    assert(run(rows, 1) == brute(rows, 1))
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("short strings below the gram bound go through the fallback pool") {
    val rows = Seq(
      1L -> "ab", 2L -> "ac", 3L -> "b", 4L -> "xy", 5L -> "abcd",
      6L -> "abce", 7L -> "", 8L -> "a")
    assert(run(rows, 1) == brute(rows, 1))
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("distance values are the exact levenshtein distances") {
    val rows = Seq(1L -> "kitten", 2L -> "sitten", 3L -> "sittin")
    val got = run(rows, 2)
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 2L)))
  }

  test("incremental probe equals the full self-join restricted to " +
    "batch-touching pairs, including unseen-gram batch strings") {
    val corpus = Seq(
      1L -> "Customer#000000010", 2L -> "Customer#000000011",
      3L -> "Customer#000000110", 4L -> "short", 5L -> "ab")
    val batch = Seq(
      10L -> "Customer#000000012", 11L -> "Customer#000000013",
      12L -> "zzqqzzqq", // grams unseen in the corpus
      13L -> "shore", 14L -> "ac")
    val all = corpus ++ batch
    val batchIds = batch.map(_._1).toSet
    for (k <- Seq(1, 2); q <- Seq(2, 3)) {
      val expect = brute(all, k).filter(p =>
        batchIds(p._1) || batchIds(p._2))
      val idx = graft.operators.FuzzyJoin.buildIndex(
        corpus.toDF("id", "s"), "id", "s", k, q)
      val got = graft.operators.FuzzyJoin.probe(
          idx, batch.toDF("id", "s"), "id", "s")
        .select($"a_id", $"b_id", $"dist").as[(Long, Long, Long)]
        .collect().toSet
      assert(got == expect, s"k=$k q=$q")
    }
  }

  test("degenerate low-entropy corpus is detected at build time, " +
    "and selectQ picks the smallest viable gram size") {
    import graft.operators.FuzzyJoin
    // binary-alphabet keys: ~2^q distinct grams, so small q gives a
    // block load in the thousands — the silent-quadratic regime the
    // 30x Customer# corpus hit at q=2 (measured load 1239, >22 min)
    val degenerate = (0 until 3000).map(i =>
      i.toLong -> (0 until 14).map(b => (i >> b) & 1).mkString).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.buildIndex(degenerate, "id", "s", k = 1, q = 2)
    }
    assert(e.getMessage.contains("degenerate") &&
      e.getMessage.contains("selectQ"))
    // q=6 is the first size with ~2^6 grams beating the 512 bound
    assert(FuzzyJoin.selectQ(degenerate, "id", "s", k = 1, qMax = 8) === 6)
    // validate=false is the explicit production escape hatch
    FuzzyJoin.buildIndex(degenerate, "id", "s", k = 1, q = 2,
      validate = false)
    // a healthy mixed-name corpus selects q=2 and builds clean
    val healthy = (0 until 500).map(i =>
      i.toLong -> s"Artist ${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar} no$i")
      .toDF("id", "s")
    assert(FuzzyJoin.selectQ(healthy, "id", "s", k = 1) === 2)
    FuzzyJoin.buildIndex(healthy, "id", "s", k = 1, q = 2)
  }

  test("no q at all resolves through selectQ — the default path cannot " +
    "dispatch the degenerate regime") {
    import graft.operators.FuzzyJoin
    // digit-structured keys (the Customer#000… shape) need q=3 once the
    // corpus outgrows the ~100-bigram alphabet (3000 rows ÷ ~115 bigrams
    // is still under the load bound — and q=2 is then genuinely fine;
    // 30k rows is the measured-degenerate regime of SCALE.md round 6);
    // measured, not guessed, when the caller passes nothing
    val structured = (0 until 30000).map(i =>
      i.toLong -> f"Customer#${i}%09d").toDF("id", "s")
    assert(FuzzyJoin.buildIndex(structured, "id", "s", k = 1).q === 3)
    // binary-alphabet keys resolve to the measured q=6 (maxAvgBlock default
    // applies; selectQ's qMax default of 6 just reaches it)
    val degenerate = (0 until 3000).map(i =>
      i.toLong -> (0 until 14).map(b => (i >> b) & 1).mkString).toDF("id", "s")
    assert(FuzzyJoin.buildIndex(degenerate, "id", "s", k = 1).q === 6)
    // a natural-name corpus resolves to q=2, and the default-path join
    // returns the same pairs as the explicitly-tuned one
    val healthy = (0 until 300).map(i =>
      i.toLong -> s"Artist ${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar} no$i")
      .toDF("id", "s")
    val auto = FuzzyJoin.selfJoin(healthy, "id", "s", k = 1)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val tuned = FuzzyJoin.selfJoin(healthy, "id", "s", k = 1, q = 2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(auto === tuned)
  }
}
