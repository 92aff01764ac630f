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

  test("data split: leakage-safe by key, stable, fractions near target") {
    import spark.implicits._
    import graft.operators.DataSplit
    // 5 rows per key: leakage-safety means one split per key
    val rows = (0L until 2000L).map(i => (i, s"domain${i / 5}"))
      .toDF("doc_id", "source")
    val out = DataSplit.assign(rows, "source", salt = "s1")
    val perKey = out.groupBy("source")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1)
    assert(perKey.count() == 0, "every key maps to exactly one split")
    // fractions over 400 keys: binomial around 80/10/10
    val frac = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap.view.mapValues(_ / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.06, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.06, s"test ${frac("test")}")
    // stability under growth: a key's split never changes when the
    // corpus around it changes (pure function of key+salt)
    val sub = DataSplit.assign(rows.limit(100), "source", salt = "s1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = out.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, sp) => full(id) == sp })
    // a different salt re-deals
    val other = DataSplit.assign(rows, "source", salt = "s2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full.exists { case (id, sp) => other(id) != sp })
    // valFrac = 0 is a legal two-way train/test split
    val two = DataSplit.assign(rows, "source", salt = "s1",
      trainFrac = 0.8, valFrac = 0.0)
    assert(two.filter(col("split") === "val").count() == 0)
    assert(two.select("split").distinct().count() == 2)
    // NULL keys propagate to "test" (matching the SQL || form), never
    // hash as salt-alone
    val withNull = Seq((Some("domain1"), 1L), (None, 2L))
      .toDF("source", "doc_id")
    val nullRow = DataSplit.assign(withNull, "source", salt = "s1")
      .filter(col("doc_id") === 2L).select("split").head().getString(0)
    assert(nullRow == "test", s"null key lands in test, got $nullRow")
    intercept[IllegalArgumentException](
      DataSplit.assign(rows, "source", "s", trainFrac = 0.999,
        valFrac = 0.0005))
    intercept[IllegalArgumentException](
      DataSplit.assign(out, "source", "s"))
  }

  test("quantile floor: exact discrete percentile, approx within bound") {
    import spark.implicits._
    import graft.operators.QuantileFloor
    // group g: scores 1..100 → p10 = value at row ceil(0.1*100)=10 → 10
    val df = (1L to 100L).map(i => ("g", i, i))
      .toDF("grp", "score", "id")
      .unionByName((1L to 7L).map(i => ("h", i * 2, i))
        .toDF("grp", "score", "id"))
    val thr = QuantileFloor.thresholds(df, "grp", "score", q = 0.1)
      .as[(String, Long)].collect().toMap
    // h: 7 rows → ceil(0.7)=1st value = 2
    assert(thr == Map("g" -> 10L, "h" -> 2L))
    val kept = QuantileFloor.applyFloor(df,
      QuantileFloor.thresholds(df, "grp", "score", q = 0.1),
      "grp", "score")
    assert(kept.filter(col("grp") === "g").count() == 91)
    // sketch path lands within a tight rank bound of the exact one
    val approx = QuantileFloor.approxThresholds(df, "grp", "score", q = 0.1)
      .as[(String, Long)].collect().toMap
    assert(math.abs(approx("g") - 10L) <= 2 && math.abs(approx("h") - 2L) <= 2,
      s"approx $approx")
    // duplicated scores collapse into one histogram row but still count:
    // 10 copies of score 1 + 90 distinct higher → p10 = 1
    val dup = ((1 to 10).map(_ => ("d", 1L, 0L)) ++
      (2L to 91L).map(v => ("d", v, v))).toDF("grp", "score", "id")
    val dthr = QuantileFloor.thresholds(dup, "grp", "score", q = 0.1)
      .as[(String, Long)].collect().toMap
    assert(dthr == Map("d" -> 1L), s"tie handling: $dthr")
    intercept[IllegalArgumentException](
      QuantileFloor.thresholds(df, "grp", "score", q = 1.5))
  }

  test("temperature budgets: integer sqrt weights, floor split, bounds") {
    import spark.implicits._
    import graft.operators.SourceMix
    // sources with token totals 400, 100, 25 → weights 20, 10, 5
    val docs = (Seq.fill(4)(("a", 100L)) ++ Seq.fill(2)(("b", 50L)) ++
      Seq(("c", 25L))).zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "tok")
    val got = SourceMix
      .temperatureBudgets(docs, "source", col("tok"), totalBudget = 350L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 400L, 20L, 200L)) // 350*20/35
    assert(got("b") == ("b", 100L, 10L, 100L))
    assert(got("c") == ("c", 25L, 5L, 50L))
    // α=0.5 up-weights the small source: c holds 4.8% of tokens but
    // 14.3% of the budget
    assert(got.values.map(_._4).sum <= 350L, "never over-allocates")
    // non-divisible case floors, remainder unallocated
    val g2 = SourceMix
      .temperatureBudgets(docs, "source", col("tok"), totalBudget = 100L)
      .as[(String, Long, Long, Long)].collect().map(_._4).sum
    assert(g2 <= 100L && g2 >= 97L)
    intercept[IllegalArgumentException](
      SourceMix.temperatureBudgets(docs, "source", col("tok"), -1L))
  }

  test("weighted tickets: heavy rows win proportionally, deterministic") {
    import spark.implicits._
    // one row with 60 tickets among 200 rows with 1 ticket each: the
    // heavy row should appear in a small top-k far more often than
    // uniform (it holds 60/260 of all tickets)
    val docs = ((0L until 200L).map(i => (i, 1)) :+ (999L, 60))
      .toDF("doc_id", "w")
    val s1 = StratifiedSample.weightedByTickets(
      docs, "doc_id", col("w"), k = 20, salt = "a")
    assert(s1.count() == 20)
    val s2 = StratifiedSample.weightedByTickets(
      docs, "doc_id", col("w"), k = 20, salt = "a")
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSeq ==
      s2.select("doc_id").collect().map(_.getLong(0)).toSeq,
      "same salt must reproduce the sample exactly")
    // across 30 salts, the heavy row lands in the top-20 far more often
    // than a 1-ticket row would (deterministic given the salt list)
    val hits = (0 until 30).count { s =>
      StratifiedSample.weightedByTickets(
        docs, "doc_id", col("w"), 20, s"salt$s")
        .filter(col("doc_id") === 999L).count() == 1
    }
    assert(hits >= 20, s"heavy row hit only $hits/30 top-20s")
    intercept[IllegalArgumentException](
      StratifiedSample.weightedByTickets(docs, "doc_id", col("w"), 0, "x"))
    intercept[IllegalArgumentException](
      StratifiedSample.weightedByTickets(
        docs, "doc_id", col("w"), 5, "x", maxTickets = 0))
  }
}
