package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("SessionSimilarity pairs entities co-occurring within the gap") {
    import spark.implicits._
    // user 1: A,B within 10 min (one session), then C alone 2 h later;
    // user 2: A,B again → pair (A,B) scores 2; (A,C)/(B,C) never co-occur
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "A"), (1L, "2024-01-01 10:10:00", "B"),
      (1L, "2024-01-01 13:00:00", "C"),
      (2L, "2024-01-01 09:00:00", "A"), (2L, "2024-01-01 09:05:00", "B"))
      .toDF("user_id", "ts_s", "entity")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = SessionSimilarity(ev, "user_id", "ts", "entity",
      gapSeconds = 1800, perUserCap = 10, minScore = 1, topK = 10)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[String]("e_a"), r.getAs[String]("e_b"),
      r.getAs[Long]("score")) == ("A", "B", 2L))
  }

  test("SessionSimilarity caps one user's contribution") {
    import spark.implicits._
    // user 1 plays A+B in 20 separate sessions → capped at 3
    val rows = (0 until 20).flatMap { i =>
      val h = i % 10
      val d = 10 + i / 10
      Seq((1L, f"2024-01-$d%02d $h%02d:00:00", "A"),
        (1L, f"2024-01-$d%02d $h%02d:01:00", "B"))
    }
    val ev = rows.toDF("user_id", "ts_s", "entity")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = SessionSimilarity(ev, "user_id", "ts", "entity",
      gapSeconds = 1800, perUserCap = 3, minScore = 1, topK = 10).collect()
    assert(out.head.getAs[Long]("score") == 3L)
  }

  test("DIMSUM(0) agrees with exact cosine on a small matrix") {
    import spark.implicits._
    val ev = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "x"), (2L, "y"),   // user 2 ∝ user 1 → cosine 1
      (3L, "z"))                          // disjoint from both
      .toDF("user_id", "item")
    val exact = UserCosine.exact(ev, "user_id", "item", minCosine = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("cosine_r")).toMap
    assert(math.abs(exact((1L, 2L)) - 1.0) < 1e-6)
    assert(!exact.contains((1L, 3L)), "no shared items → no pair emitted")

    val dimsum = UserCosine.dimsum(ev, "user_id", "item", threshold = 0.0)
      .collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b)) -> r.getDouble(2)
      }.toMap
    assert(math.abs(dimsum((1L, 2L)) - exact((1L, 2L))) < 1e-9)
  }

  test("hot-item degree cap bounds pair generation like an LSH bucket cap") {
    import spark.implicits._
    // 40 users all share one viral item; besides it, users 1&2 share i1
    val viral = (1L to 40L).map(u => (u, "viral"))
    val niche = Seq((1L, "i1"), (2L, "i1"))
    val ev = (viral ++ niche).toDF("user_id", "item")
    val capped = UserCosine.exact(ev, "user_id", "item", 0.0,
      maxItemListeners = Some(10L)).select("u1", "u2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)),
      "only the niche co-listen survives the degree cap")
    val exact = UserCosine.exact(ev, "user_id", "item", 0.0)
      .count()
    assert(exact == 40L * 39 / 2, "uncapped pair space is quadratic")
  }

  test("sparse exact cosine matches the densified small-N verifier") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ev = Seq.fill(400)(
      (rnd.nextInt(8).toLong + 1L, s"i${rnd.nextInt(12)}"))
      .toDF("user_id", "item")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("dot"), r.getAs[Double]("cosine_r"))).toSet
    val sparse = key(UserCosine.exact(ev, "user_id", "item", 0.1))
    val dense = key(UserCosine.denseSmall(ev, "user_id", "item", 0.1))
    assert(sparse.nonEmpty && sparse == dense)
  }

  test("hierarchical exactTopK equals the global window over the full " +
    "pair set, at every chunk count") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val ev = Seq.fill(600)(
      (rnd.nextInt(15).toLong + 1L, s"i${rnd.nextInt(20)}"))
      .toDF("user_id", "item")
    // reference: full exact pairs -> symmetric mirror -> one global
    // window top-3 (the shape exactTopK must reproduce without ever
    // materializing the pair set)
    val pairs = UserCosine.exact(ev, "user_id", "item", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("cosine_r")))
    val sym = pairs.flatMap { case (a, b, s) => Seq((a, b, s), (b, a, s)) }
    val expect = sym.groupBy(_._1).view.mapValues(
        _.sortBy { case (_, o, s) => (-s, o) }.take(3)
          .map { case (_, o, s) => (o, s) }.toSeq).toMap
    for (chunks <- Seq(ChunkedPairs.Auto, 1, 3, 16)) {
      val got = UserCosine.exactTopK(ev, "user_id", "item", k = 3,
          pairChunks = chunks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(
          _.sortBy { case (_, o, s) => (-s, o) }
            .map { case (_, o, s) => (o, s) }.toSeq).toMap
      assert(got === expect, s"chunks=$chunks")
    }
  }

  test("dimsumTopK equals the tau-filter of exact top-k, bit-for-bit") {
    import spark.implicits._
    // all >=tau pairs rank above all <tau pairs in any user's desc
    // list, so filter(exactTopK(k)) and dimsumTopK(k, tau) must agree
    // exactly — including the re-derived 6-dp similarity values
    // sparse corpus: most pairs share ~1 of ~15 items (cosine well
    // under τ), some share several (over τ) — both finder legs exercised.
    // τ = 0.1 is the production setting, where the oversampling γ
    // saturates every inclusion probability (deterministic finder).
    val rnd = new scala.util.Random(29)
    val ev = Seq.fill(1000)(
      (rnd.nextInt(60).toLong + 1L, s"i${rnd.nextInt(200)}"))
      .toDF("user_id", "item")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("similarity"))).toSet
    val tau = 0.1
    val expect = key(
      UserCosine.exactTopK(ev, "user_id", "item", k = 4)
        .filter(col("similarity") >= tau))
    val got = key(
      UserCosine.dimsumTopK(ev, "user_id", "item", k = 4, tau = tau))
    assert(expect.nonEmpty && got == expect)
    // and some pair space genuinely sits below tau (the finder prunes)
    assert(UserCosine.exact(ev, "user_id", "item", 0.0)
      .filter(col("cosine_r") < tau).count() > 0)
  }

  test("cooccurrence PMI: hand-computed fixture, chunk-count invariant") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"), (4L, "C"),
      (1L, "A") /* duplicate listen — presence dedups */)
      .toDF("user_id", "item")
    // N=4; deg A=3 B=3 C=2; both: (A,B)=2, (A,C)=1, (B,C)=1
    val expect = Map(
      ("A", "B") -> (2L, BigDecimal(math.log(2.0 * 4 / (3 * 3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("A", "C") -> (1L, BigDecimal(math.log(1.0 * 4 / (3 * 2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("B", "C") -> (1L, BigDecimal(math.log(1.0 * 4 / (3 * 2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    for (chunks <- Seq(ChunkedPairs.Auto, 1, 4)) {
      val got = Cooccurrence.pmi(ev, "user_id", "item", minBoth = 1,
          pairChunks = chunks)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got === expect, s"chunks=$chunks")
    }
    // support filter prunes inside the chunk job
    val sup = Cooccurrence.pmi(ev, "user_id", "item", minBoth = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(sup.toSeq === Seq(("A", "B")))
  }

  test("incremental co-occurrence maintenance equals the full recompute " +
    "and is idempotent under replayed batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val all = Seq.fill(400)(
      (rnd.nextInt(20).toLong + 1L, s"i${rnd.nextInt(12)}"))
      .toDF("user_id", "item")
    // split on item so users straddle the cut (replayed (item, user)
    // rows collide with existing presence — the hard case)
    val base = all.filter(col("item") < "i6")
    val batch = all.filter(col("item") >= "i6")
    val basePres = base.select(col("item"), col("user_id").as("user"))
      .distinct()
    val basePairs = ChunkedPairs.dots(
        basePres.select(col("item"), col("user"), lit(1L).as("c")),
        "item", "user", "c")
      .select(col("u1").as("item_a"), col("u2").as("item_b"),
        col("dot").as("users_both"))
    val (pairs, presence) = Cooccurrence.updateCounts(
      basePairs, basePres, batch, "user_id", "item")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val full = key(Cooccurrence.pmi(all, "user_id", "item", minBoth = 1))
    assert(key(Cooccurrence.scoreCounts(pairs, presence, minBoth = 1))
      === full)
    // replaying the same batch must be a no-op (presence anti-join)
    val (pairs2, presence2) = Cooccurrence.updateCounts(
      pairs, presence, batch, "user_id", "item")
    assert(key(Cooccurrence.scoreCounts(pairs2, presence2, minBoth = 1))
      === full)
  }
}
