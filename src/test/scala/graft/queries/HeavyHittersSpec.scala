package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions

/** [[graft.functions.MisraGriesAgg]] — exactness condition, the
  * N/(k+1) error envelope, the frequent-survivor guarantee, and
  * partition invariance of the exact regime. */
class HeavyHittersSpec extends SparkSpec {

  private def freqs(rows: Seq[String]): Map[String, Long] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketch(rows: Seq[String], cap: Int, parts: Int)
      : Seq[(String, Long)] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    rows.toDF("item").repartition(parts)
      .agg(GraftFunctions.heavyHitters(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("capacity >= distinct: exact counts, sorted (count desc, item), " +
    "invariant across partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(3000)(s"w${rnd.nextInt(40)}")
    val exact = freqs(rows)
    val expect = exact.toSeq.sortBy { case (k, c) => (-c, k) }
    for (parts <- Seq(1, 7, 32)) {
      assert(sketch(rows, cap = 64, parts) === expect, s"parts=$parts")
    }
  }

  test("capacity < distinct: every count within [true - N/(k+1), true], " +
    "every item above the threshold survives") {
    val rnd = new scala.util.Random(11)
    // skewed: a few heavy items + a long tail of singletons
    val heavy = Seq.tabulate(5)(i => Seq.fill(400 - 50 * i)(s"H$i")).flatten
    val tail = Seq.tabulate(800)(i => s"t$i")
    val rows = rnd.shuffle(heavy ++ tail)
    val n = rows.size.toLong
    val cap = 20
    val exact = freqs(rows)
    for (parts <- Seq(1, 8)) {
      val got = sketch(rows, cap, parts)
      val bound = n.toDouble / (cap + 1)
      got.foreach { case (item, c) =>
        val t = exact(item)
        assert(c <= t, s"overestimate for $item: $c > $t")
        assert(c >= t - bound, s"under bound for $item: $c < $t - $bound")
      }
      // Misra–Gries survivor guarantee: true frequency > N/(k+1) cannot
      // be evicted, in any partition/merge order
      val mustSurvive = exact.filter(_._2 > bound).keySet
      val present = got.map(_._1).toSet
      assert(mustSurvive.subsetOf(present),
        s"lost frequent items: ${mustSurvive -- present}")
    }
  }

  test("long keys, nulls skipped, top-n slice is deterministic") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq[(Option[Long], String)](
      (Some(1L), "g"), (Some(1L), "g"), (Some(2L), "g"),
      (None, "g"), (Some(3L), "g"), (Some(2L), "g"), (Some(9L), "g"))
      .toDF("k", "g")
    val got = df.groupBy(col("g"))
      .agg(GraftFunctions.heavyHitters(col("k"), 16).as("hh"))
      .select(explode(slice(col("hh"), 1, 2)).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 2L)))
  }

  test("q226 plans ObjectHashAggregate — map-side bounded-state " +
    "partials, not a sort-based fallback") {
    val plan = Registry.byName("q226_heavy_hitters")
      .run(spark, sf("")).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // two-phase: a partial before the exchange, a merge after — the
    // shuffle carries k counters per group, not the raw key stream
    assert(plan.contains("partial_graft_heavy_hitters"), plan)
  }
}
