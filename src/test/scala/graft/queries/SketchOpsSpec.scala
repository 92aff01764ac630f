package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.CountMin

/** Count-min sketch: overestimate guarantee, mergeability, guards. */
class SketchOpsSpec extends SparkSpec {

  test("innerProduct join-size estimate: never under, exact when sparse") {
    import spark.implicits._
    // A: key_i with multiplicity i+1 (i<8); B: keys 4..11 once each.
    // True join size on the sketched key = sum_{i=4..7} (i+1) = 26.
    val a = (0 until 8).flatMap(i => Seq.fill(i + 1)(s"key$i")).toDF("k")
    val b = (4 until 12).map(i => s"key$i").toDF("k")
    val est = CountMin.innerProduct(
        CountMin.sketch(a, "k", depth = 4, hexChars = 3),
        CountMin.sketch(b, "k", depth = 4, hexChars = 3))
      .as[Long].head()
    assert(est >= 26L)
    // 16 keys in 4096 buckets: no colliding cells on this fixture, so
    // the estimate is exactly the true join cardinality
    assert(est == 26L)
    // disjoint key spaces: some sketch row has no coinciding populated
    // cell, which PROVES emptiness — the estimate must be exactly 0
    val disj = CountMin.innerProduct(
        CountMin.sketch(Seq("x1", "x2").toDF("k"), "k"),
        CountMin.sketch(Seq("y1", "y2").toDF("k"), "k"))
      .as[Long].head()
    assert(disj == 0L)
  }

  test("cms never underestimates, and is exact on a sparse key space") {
    import spark.implicits._
    val items = (0 until 400).map(i => s"key${i % 16}").toDF("k")
    val sk = CountMin.sketch(items, "k", depth = 4, hexChars = 3)
    val exact = items.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(sk, exact, "k", depth = 4, hexChars = 3)
      .select(col("k"), col("cms_count"), col("exact"))
      .as[(String, Long, Long)].collect()
    assert(est.length == 16)
    est.foreach { case (k, cms, ex) =>
      assert(cms >= ex, s"$k: cms $cms < exact $ex")
    }
    // 16 keys in 4096 buckets × 4 rows: no key collides in ALL rows on
    // this fixture (deterministic md5 layout), so estimates are exact
    est.foreach { case (k, cms, ex) =>
      assert(cms == ex, s"$k: cms $cms != exact $ex on sparse fixture")
    }
  }

  test("cms estimate is 0 for never-seen keys") {
    import spark.implicits._
    val sk = CountMin.sketch(
      Seq("a", "b", "a").toDF("k"), "k", depth = 4, hexChars = 3)
    val est = CountMin.estimate(
        sk, Seq("zzz-not-there").toDF("k"), "k", depth = 4, hexChars = 3)
      .select(col("cms_count")).as[Long].collect()
    assert(est.sameElements(Array(0L)))
  }

  test("cms merge equals the sketch of the union, cell for cell") {
    import spark.implicits._
    val a = (0 until 100).map(i => s"w${i % 7}").toDF("k")
    val b = (0 until 130).map(i => s"w${i % 11}").toDF("k")
    val merged = CountMin.merge(
        CountMin.sketch(a, "k", 4, 2), CountMin.sketch(b, "k", 4, 2))
      .as[(Int, String, Long)].collect().toSet
    val whole = CountMin.sketch(a.unionByName(b), "k", 4, 2)
      .as[(Int, String, Long)].collect().toSet
    assert(merged == whole)
  }

  test("fast family: never underestimates, exact on sparse keys, " +
    "0 for never-seen keys") {
    import spark.implicits._
    val items = (0 until 400).map(i => s"key${i % 16}").toDF("k")
    val sk = CountMin.sketchFast(items, "k", depth = 4, width = 4096)
    val exact = items.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimateFast(sk, exact, "k", depth = 4, width = 4096)
      .select(col("k"), col("cms_count"), col("exact"))
      .as[(String, Long, Long)].collect()
    assert(est.length == 16)
    est.foreach { case (k, cms, ex) =>
      assert(cms >= ex, s"$k: cms $cms < exact $ex")
      assert(cms == ex, s"$k: cms $cms != exact $ex on sparse fixture")
    }
    val missing = CountMin.estimateFast(
        sk, Seq("zzz-not-there").toDF("k"), "k", 4, 4096)
      .select(col("cms_count")).as[Long].collect()
    assert(missing.sameElements(Array(0L)))
    // buckets are longs in [0, width)
    val buckets = sk.select(col("sk_bucket").cast("long")).as[Long].collect()
    assert(buckets.forall(b => b >= 0L && b < 4096L))
  }

  test("fast family: merge equals the sketch of the union; non-power-of-16 " +
    "width works; innerProduct runs on fast cell tables") {
    import spark.implicits._
    val a = (0 until 100).map(i => s"w${i % 7}").toDF("k")
    val b = (0 until 130).map(i => s"w${i % 11}").toDF("k")
    val merged = CountMin.merge(
        CountMin.sketchFast(a, "k", 4, 1000),
        CountMin.sketchFast(b, "k", 4, 1000))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.sketchFast(a.unionByName(b), "k", 4, 1000)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
    // join-size estimate over fast sketches: never under; disjoint → 0
    val est = CountMin.innerProduct(
        CountMin.sketchFast((0 until 8).flatMap(i =>
          Seq.fill(i + 1)(s"key$i")).toDF("k"), "k", 4, 4096),
        CountMin.sketchFast((4 until 12).map(i => s"key$i").toDF("k"),
          "k", 4, 4096))
      .as[Long].head()
    assert(est >= 26L)
    val disj = CountMin.innerProduct(
        CountMin.sketchFast(Seq("x1", "x2").toDF("k"), "k"),
        CountMin.sketchFast(Seq("y1", "y2").toDF("k"), "k"))
      .as[Long].head()
    assert(disj == 0L)
  }

  test("innerProduct derives depth from the sketches and rejects a " +
    "mismatched pair; empty sketches estimate 0") {
    import spark.implicits._
    val d4 = CountMin.sketch(Seq("a", "b").toDF("k"), "k", depth = 4)
    val d2 = CountMin.sketch(Seq("a", "b").toDF("k"), "k", depth = 2)
    intercept[IllegalArgumentException](CountMin.innerProduct(d4, d2))
    val empty = CountMin.sketch(
      Seq.empty[String].toDF("k"), "k", depth = 4)
    assert(CountMin.innerProduct(empty, empty).as[Long].head() == 0L)
    // ONE-sided empty: an empty relation's true join size is 0 on either
    // side — the emptiness check precedes the depth-equality guard
    // (an empty sketch has no rows to derive a depth from)
    assert(CountMin.innerProduct(empty, d4).as[Long].head() == 0L)
    assert(CountMin.innerProduct(d4, empty).as[Long].head() == 0L)
    // same-depth fast and md5 grids ARE accepted structurally (both are
    // cell tables); estimates across families are the caller's error the
    // depth check cannot see — families must match by contract
  }

  test("cms drops null keys and rejects bad params") {
    import spark.implicits._
    val withNull = Seq(Some("a"), None, Some("a")).toDF("k")
    val sk = CountMin.sketch(withNull, "k", depth = 2, hexChars = 2)
    // only "a" contributes: exactly `depth` populated cells of count 2
    val cells = sk.as[(Int, String, Long)].collect()
    assert(cells.length == 2 && cells.forall(_._3 == 2L))
    intercept[IllegalArgumentException](
      CountMin.sketch(withNull, "k", depth = 0, hexChars = 2))
    intercept[IllegalArgumentException](
      CountMin.sketch(withNull, "k", depth = 4, hexChars = 9))
    intercept[IllegalArgumentException](
      CountMin.estimate(sk, withNull.withColumnRenamed("k", "cms_count"),
        "cms_count", 2, 2))
  }
}
