package graft.queries

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.operators.{Bm25, RobustStats, Scd2}

/** Hand-computed fixtures for the round-6 additions: BM25 retrieval,
  * SCD Type-2 history build, and robust median/MAD outlier gating. */
class RetrievalScdSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def docs4 = {
    import spark.implicits._
    Seq(
      (1L, "a b a"),
      (2L, "b c"),
      (3L, "c c c"),
      (4L, "a c")).toDF("doc_id", "text")
  }

  test("bm25 postings carry tf and dl per (doc, term)") {
    val p = Bm25.postings(docs4, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2),
        r.getLong(3), r.getLong(1))).toSet
    assert(p === Set(
      (1L, "a", 2L, 3L), (1L, "b", 1L, 3L),
      (2L, "b", 1L, 2L), (2L, "c", 1L, 2L),
      (3L, "c", 3L, 3L),
      (4L, "a", 1L, 2L), (4L, "c", 1L, 2L)))
  }

  // the operator's documented arithmetic, replayed in plain JVM doubles
  private def fp(n: Long, tot: Long, df: Long, tf: Long, dl: Long): Long = {
    val idf = (2 * n - 2 * df + 1).toDouble / (2 * df + 1).toDouble
    val tfp = (22 * tot * tf).toDouble /
      (10 * tot * tf + 3 * tot + 9 * n * dl).toDouble
    math.floor(idf * tfp * 1000000d).toLong
  }

  test("bm25 scores match the rational arithmetic exactly") {
    // N=4, tot=3+2+3+2=10; df(a)=2 (d1,d4), df(c)=3 (d2,d3,d4)
    val s = Bm25.scoreTerms(docs4, "doc_id", "text", Seq("a", "c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(5))
      .toMap
    assert(s((1L, "a")) === fp(4, 10, 2, 2, 3))
    assert(s((4L, "a")) === fp(4, 10, 2, 1, 2))
    assert(s((2L, "c")) === fp(4, 10, 3, 1, 2))
    assert(s((3L, "c")) === fp(4, 10, 3, 3, 3))
    assert(s((4L, "c")) === fp(4, 10, 3, 1, 2))
    assert(s.size === 5)
  }

  test("bm25 retrieve sums fixed-point scores and ranks deterministically") {
    val r = Bm25.retrieve(docs4, "doc_id", "text", "a c", k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val expect = Map(
      1L -> (fp(4, 10, 2, 2, 3), 1L),
      2L -> (fp(4, 10, 3, 1, 2), 1L),
      3L -> (fp(4, 10, 3, 3, 3), 1L),
      4L -> (fp(4, 10, 2, 1, 2) + fp(4, 10, 3, 1, 2), 2L))
    assert(r.map(x => x._1 -> (x._2, x._3)).toMap === expect)
    // rank order: by score desc then doc_id
    val sorted = expect.toSeq.sortBy { case (id, (s, _)) => (-s, id) }.map(_._1)
    val ranked = Bm25.retrieve(docs4, "doc_id", "text", "a c", k = 10)
      .orderBy(col("doc_rank")).collect().map(_.getLong(0)).toSeq
    assert(ranked === sorted)
  }

  test("bm25 guards: empty query, duplicate terms, bad k") {
    intercept[IllegalArgumentException] {
      Bm25.scoreTerms(docs4, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Bm25.scoreTerms(docs4, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Bm25.retrieve(docs4, "doc_id", "text", "a", k = 0)
    }
    // retrieve dedups repeated query words itself
    assert(Bm25.retrieve(docs4, "doc_id", "text", "a a", k = 3)
      .count() === 2)
  }

  private def scdEvents = {
    import spark.implicits._
    Seq(
      // user 1: A,A,B,A -> runs A[1,3) B[3,4) A[4,_)
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "A", ts("2024-01-02 00:00:00"), 2L),
      (1L, "B", ts("2024-01-03 00:00:00"), 3L),
      (1L, "A", ts("2024-01-04 00:00:00"), 4L),
      // user 2: equal timestamps, event_id breaks the tie
      (2L, "A", ts("2024-01-01 00:00:00"), 5L),
      (2L, "B", ts("2024-01-01 00:00:00"), 6L),
      // user 3: NULL states form runs too
      (3L, null, ts("2024-01-01 00:00:00"), 7L),
      (3L, null, ts("2024-01-02 00:00:00"), 8L),
      (3L, "C", ts("2024-01-03 00:00:00"), 9L))
      .toDF("user_id", "state", "ts", "event_id")
  }

  test("scd2 history compresses runs and stitches intervals") {
    val h = Scd2.history(scdEvents, "user_id", "state", "ts", "event_id")
      .orderBy(col("user_id"), col("version")).collect()
    val got = h.map(r => (r.getLong(0), Option(r.getString(1)),
      r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4),
      r.getBoolean(5))).toSeq
    assert(got === Seq(
      (1L, Some("A"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), 1L, false),
      (1L, Some("B"), ts("2024-01-03 00:00:00"),
        Some(ts("2024-01-04 00:00:00")), 2L, false),
      (1L, Some("A"), ts("2024-01-04 00:00:00"), None, 3L, true),
      (2L, Some("A"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-01 00:00:00")), 1L, false),
      (2L, Some("B"), ts("2024-01-01 00:00:00"), None, 2L, true),
      (3L, None, ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), 1L, false),
      (3L, Some("C"), ts("2024-01-03 00:00:00"), None, 2L, true)))
  }

  test("scd2 merge: incremental rebuild equals full recompute, " +
    "late events splice and collapse runs, untouched keys pass through") {
    import spark.implicits._
    val prior = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "B", ts("2024-01-05 00:00:00"), 2L),
      (2L, "X", ts("2024-01-01 00:00:00"), 3L),
      (3L, "Z", ts("2024-01-01 00:00:00"), 4L))
      .toDF("user_id", "state", "ts", "event_id")
    // batch: a LATE event for key 1 that lands inside the A run with
    // state A (must merge into the run, not split it), a later C, and a
    // new key 4; keys 2 and 3 are untouched
    val batch = Seq(
      (1L, "A", ts("2024-01-03 00:00:00"), 10L),
      (1L, "C", ts("2024-01-07 00:00:00"), 11L),
      (4L, "N", ts("2024-01-02 00:00:00"), 12L))
      .toDF("user_id", "state", "ts", "event_id")
    val hist = Scd2.history(prior, "user_id", "state", "ts", "event_id")
    val merged = Scd2.merge(hist, prior, batch,
      "user_id", "state", "ts", "event_id")
    val full = Scd2.history(prior.unionByName(batch),
      "user_id", "state", "ts", "event_id")
    assert(merged.collect().toSet == full.collect().toSet)
    val k1 = merged.filter(col("user_id") === 1L)
      .orderBy(col("version")).collect()
      .map(r => (r.getString(1), r.getLong(4))).toSeq
    assert(k1 == Seq(("A", 1L), ("B", 2L), ("C", 3L))) // A run unsplit
    // untouched keys keep their exact original rows
    val k23 = merged.filter(col("user_id").isin(2L, 3L)).collect().toSet
    assert(k23 == hist.filter(col("user_id").isin(2L, 3L)).collect().toSet)
  }

  test("scd2 merge plans a shuffled semi-join when broadcast is off " +
    "(backfill batch touching most keys) with results unchanged") {
    import spark.implicits._
    val prior = (1L to 200L).map(k =>
      (k, "A", ts("2024-01-01 00:00:00"), k)).toDF(
      "user_id", "state", "ts", "event_id")
    val batch = (1L to 180L).map(k =>
      (k, "B", ts("2024-02-01 00:00:00"), 1000L + k)).toDF(
      "user_id", "state", "ts", "event_id")
    val hist = Scd2.history(prior, "user_id", "state", "ts", "event_id")
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val merged = Scd2.merge(hist, prior, batch,
        "user_id", "state", "ts", "event_id")
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"touched-key joins must not force a broadcast:\n$plan")
      assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
        s"semi/anti shape expected:\n$plan")
      val full = Scd2.history(prior.unionByName(batch),
        "user_id", "state", "ts", "event_id")
      assert(merged.collect().toSet == full.collect().toSet)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("scd2 current and point-in-time lookup") {
    val cur = Scd2.current(scdEvents, "user_id", "state", "ts", "event_id")
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(3)))
    assert(cur.toSeq === Seq(
      (1L, Some("A"), 3L), (2L, Some("B"), 2L), (3L, Some("C"), 2L)))
    val h = Scd2.history(scdEvents, "user_id", "state", "ts", "event_id")
    val at = Scd2.stateAt(h, lit(ts("2024-01-03 12:00:00")))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(at.toSeq === Seq((1L, Some("B")), (2L, Some("B")),
      (3L, Some("C"))))
  }

  test("scd2 rejects colliding column roles") {
    intercept[IllegalArgumentException] {
      Scd2.history(scdEvents, "user_id", "user_id", "ts", "event_id")
    }
  }

  test("robust profile: lower median, MAD, and the 3-MAD gate") {
    import spark.implicits._
    val df = (Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L),
      ("g", 100L)) ++
      Seq(("h", 1L), ("h", 2L), ("h", 3L), ("h", 4L)))
      .toDF("grp", "v")
    val p = RobustStats.profile(df, "grp", "v", k = 3)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // g: n=5 median=3 devs {2,1,0,1,97} mad=1, 97>3 -> 1 outlier
    // h: n=4 lower median=2 devs {1,0,1,2} mad=1, none>3
    assert(p.toSeq === Seq(
      ("g", 5L, 3L, 1L, 1L, 0.2), ("h", 4L, 2L, 1L, 0L, 0.0)))
    val out = RobustStats.outliers(df, "grp", "v", k = 3).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("g", 100L)))
  }
}
