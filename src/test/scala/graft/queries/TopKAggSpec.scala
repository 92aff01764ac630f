package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.Kmv

/** [[graft.functions.BoundedTopKAgg]] — exactness at every k (top-k of
  * a union == top-k of per-partition top-ks), distinct-pair set
  * semantics, both directions' tie order, and the KMV estimator
  * envelope ([[graft.operators.Kmv]]) in the k < n regime. */
class TopKAggSpec extends SparkSpec {

  private def run(
      rows: Seq[(Long, Long)], k: Int, parts: Int, smallest: Boolean)
      : Seq[(Long, Long)] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val agg =
      if (smallest) GraftFunctions.bottomK(col("item"), col("w"), k)
      else GraftFunctions.topK(col("item"), col("w"), k)
    rows.toDF("item", "w").repartition(parts)
      .agg(agg.as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("exact at every k, both directions, invariant across partitionings") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt(90).toLong))
    val distinctPairs = rows.map { case (i, w) => (w, i) }.distinct
    val topExpect = distinctPairs.sortBy { case (w, i) => (-w, i) }
      .take(17).map { case (w, i) => (i, w) }
    val botExpect = distinctPairs.sortBy { case (w, i) => (w, i) }
      .take(17).map { case (w, i) => (i, w) }
    for (parts <- Seq(1, 3, 8)) {
      assert(run(rows, 17, parts, smallest = false) === topExpect,
        s"top parts=$parts")
      assert(run(rows, 17, parts, smallest = true) === botExpect,
        s"bottom parts=$parts")
    }
  }

  test("distinct-pair set semantics: a re-seen identical pair does not " +
    "occupy a second slot; nulls skipped") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq[(Option[Long], Option[Long])](
      (Some(7L), Some(5L)), (Some(7L), Some(5L)), (Some(3L), Some(5L)),
      (None, Some(9L)), (Some(4L), None), (Some(1L), Some(2L)))
      .toDF("item", "w")
    val got = df.agg(GraftFunctions.topK(col("item"), col("w"), 2).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // (7,5) twice collapses to one slot; tie at w=5 broken item asc
    assert(got === Seq((3L, 5L), (7L, 5L)))
  }

  test("string items: tie order is item-ascending in both directions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("b", 5L), ("a", 5L), ("c", 5L), ("d", 1L)).toDF("item", "w")
    val top = df.agg(GraftFunctions.topK(col("item"), col("w"), 2).as("t"))
      .select(expr("transform(t, e -> e.item)")).collect()(0).getSeq[String](0)
    val bot = df.agg(GraftFunctions.bottomK(col("item"), col("w"), 2).as("t"))
      .select(expr("transform(t, e -> e.item)")).collect()(0).getSeq[String](0)
    assert(top === Seq("a", "b"))
    assert(bot === Seq("d", "a"))
  }

  test("KMV: exact below capacity, (k-1)/u_k envelope at capacity " +
    "across salts") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val n = 20000
    val items = (1 to n).map(_.toLong).toDF("item")
    // exact regime: k > n returns the precise distinct count
    val exact = items
      .agg(GraftFunctions.bottomK(col("item"), xxhash64(col("item")),
        1 << 16).as("sk"))
      .select(Kmv.distinctEstimate(col("sk"), 1 << 16).as("est"))
      .collect()(0).getDouble(0)
    assert(exact === n.toDouble)
    // estimation regime: k = 256, relative std error ~ 1/sqrt(k-2) ≈
    // 6.3%; pin 3.2σ = 20% per salt (deterministic: fixed salts)
    val k = 256
    val errs = (1 to 5).map { salt =>
      val est = items
        .agg(GraftFunctions.bottomK(col("item"),
          xxhash64(lit(salt), col("item")), k).as("sk"))
        .select(Kmv.distinctEstimate(col("sk"), k).as("est"))
        .collect()(0).getDouble(0)
      math.abs(est - n) / n
    }
    assert(errs.max < 0.20, s"KMV relative errors: $errs")
    assert(errs.min < 0.05, s"suspiciously uniform error floor: $errs")
  }

  test("q232 plans ObjectHashAggregate with map-side partials") {
    val plan = Registry.byName("q232_topk_agg")
      .run(spark, sf("")).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_top_k"), plan)
  }
}
