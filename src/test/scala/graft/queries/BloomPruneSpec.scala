package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.BloomPrune

/** Bloom runtime-filter pruning: differential equality with the exact
  * join/anti-join, the no-false-negative guarantee, null-key semantics,
  * and the plan shape (probe filter below the join; no fresh shuffle
  * introduced by the prune itself).
  */
class BloomPruneSpec extends SparkSpec {

  private def li = spark.read.parquet(s"${sf("")}/lineitem.parquet")
    .select("l_orderkey", "l_extendedprice")
  private def hi = spark.read.parquet(s"${sf("")}/orders.parquet")
    .filter(col("o_totalprice") > 450000).select("o_orderkey")

  test("pruned inner join equals the un-pruned join exactly") {
    val exact = li.join(hi, col("l_orderkey") === col("o_orderkey"))
    val pruned = BloomPrune.pruneLong(li, "l_orderkey", hi, "o_orderkey")
      .join(hi, col("l_orderkey") === col("o_orderkey"))
    assert(pruned.count() == exact.count())
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
  }

  test("prune keeps every matching key (no false negatives) and drops most") {
    val total = li.count()
    val matching = li.join(hi, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val kept = BloomPrune.pruneLong(li, "l_orderkey", hi, "o_orderkey").count()
    assert(kept >= matching, "bloom must never drop a matching row")
    // fpp=0.01 on a ~10%-selective dim: the prune must bite hard
    assert(kept < total / 2,
      s"expected a strong prune, kept $kept of $total")
  }

  test("bloom anti join is row-identical to exact left_anti incl. nulls") {
    import spark.implicits._
    val fact = Seq[(Option[Long], String)](
      (Some(1L), "hit"), (Some(2L), "miss"), (None, "nullkey"),
      (Some(3L), "hit2"), (Some(99L), "miss2"))
      .toDF("k", "tag")
    val dim = Seq(1L, 3L).toDF("dk")
    val exact = fact.join(dim, col("k") === col("dk"), "left_anti")
    val fast = BloomPrune.antiJoinLong(fact, "k", dim, "dk")
    assert(fast.count() == exact.count())
    assert(fast.exceptAll(exact).isEmpty && exact.exceptAll(fast).isEmpty)
    // null-key row is kept (null never equi-matches) — Spark LeftAnti law
    assert(fast.filter(col("tag") === "nullkey").count() == 1)
  }

  test("probe filter sits below the join and adds no exchange of its own") {
    val pruned = BloomPrune.pruneLong(li, "l_orderkey", hi, "o_orderkey")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan)
    // the prune is a scan-side Filter: no aggregate/join/exchange nodes
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("string prune equals the exact string join (xxhash64 reduction)") {
    import spark.implicits._
    val fact = spark.read.parquet(s"${sf("")}/lineitem.parquet")
      .select(concat(lit("mbid-"), col("l_orderkey")).as("fk"),
        col("l_extendedprice"))
    val dim = spark.read.parquet(s"${sf("")}/orders.parquet")
      .filter(col("o_totalprice") > 450000)
      .select(concat(lit("mbid-"), col("o_orderkey")).as("dk"))
    val exact = fact.join(dim, col("fk") === col("dk"), "left_semi")
    val pruned = BloomPrune.pruneString(fact, "fk", dim, "dk")
      .join(dim, col("fk") === col("dk"), "left_semi")
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
    // no false negatives, and the hash-keyed bloom still bites
    val kept = BloomPrune.pruneString(fact, "fk", dim, "dk").count()
    assert(kept >= exact.count() && kept < fact.count() / 2,
      s"kept $kept of ${fact.count()}")
  }

  test("string anti join row-identical to left_anti incl. null keys") {
    import spark.implicits._
    val fact = Seq(
      (Option("mbid-1"), "hit"), (Option("mbid-2"), "miss"),
      (Option.empty[String], "nullkey"), (Option("mbid-3"), "hit2"))
      .toDF("k", "tag")
    val dim = Seq("mbid-1", "mbid-3").toDF("dk")
    val exact = fact.join(dim, col("k") === col("dk"), "left_anti")
    val fast = BloomPrune.antiJoinString(fact, "k", dim, "dk")
    assert(fast.exceptAll(exact).isEmpty && exact.exceptAll(fast).isEmpty)
    assert(fast.filter(col("tag") === "nullkey").count() == 1)
  }

  test("anti join tolerates identical fact/dim key names") {
    import spark.implicits._
    // regression: col(factKey) === col(dimKey) used to be ambiguous when
    // both sides named the key identically — the dim key is now aliased
    val fact = Seq(1L, 2L, 3L, 4L).toDF("k")
    val dim = Seq(2L, 4L).toDF("k")
    val got = BloomPrune.antiJoinLong(fact, "k", dim, "k")
      .as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 3L)))
    val sGot = BloomPrune.antiJoinString(
        Seq("a", "b", "c").toDF("k"), "k", Seq("b").toDF("k"), "k")
      .as[String].collect().sorted
    assert(sGot.sameElements(Array("a", "c")))
  }

  test("expression rejects wrong arity and non-literal bloom bytes") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(1L).toDF("k")
    intercept[Exception] {
      df.select(call_function("graft_bloom_contains", col("k"))).collect()
    }
    intercept[Exception] {
      // non-foldable binary argument must be refused by the type check
      val bin = Seq((1L, Array[Byte](1, 2))).toDF("k", "b")
      bin.select(call_function("graft_bloom_contains", col("k"), col("b")))
        .collect()
    }
  }
}
