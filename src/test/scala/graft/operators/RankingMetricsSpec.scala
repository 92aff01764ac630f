package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[RankingMetrics]] — brute-force NDCG/hit-metric differentials in
  * the same fixed chain order, edge anchors, tie invariance, and
  * partition invariance. */
class RankingMetricsSpec extends SparkSpec {

  private val k = 5

  // (query, item, score, gain) — score ranks descending, item breaks ties
  private val rows: Seq[(Long, Long, Long, Long)] = {
    val rnd = new scala.util.Random(23)
    for {
      q <- 0L until 40L
      i <- 0L until (rnd.nextInt(9) + 1).toLong
    } yield (q, i, rnd.nextInt(20).toLong, rnd.nextInt(4).toLong)
  }

  private def df = {
    import spark.implicits._
    rows.toDF("q_id", "item", "score", "gain").repartition(5)
  }

  private val order = Seq(col("score").desc, col("item"))

  test("ndcg matches a brute-force reimplementation bit-for-bit") {
    val got = RankingMetrics.ndcgAtK(df, col("q_id"), col("gain"),
      order, k).collect()
      .map(r => r.getAs[Long]("query") ->
        (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
          Option(r.getAs[java.lang.Double]("ndcg")))).toMap
    val w = RankingMetrics.dcgWeights(k)
    def chainDcg(gains: Seq[Long]): Double = {
      val padded = gains.take(k).padTo(k, 0L)
      var acc = padded.head * w.head
      (1 until k).foreach(i => acc = acc + padded(i) * w(i))
      acc
    }
    rows.groupBy(_._1).foreach { case (q, its) =>
      val sys = its.sortBy { case (_, item, score, _) => (-score, item) }
        .map(_._4)
      val ideal = its
        .sortBy { case (_, item, score, g) => (-g, -score, item) }
        .map(_._4)
      val (dcg, idcg, ndcg) = got(q)
      assert(dcg === chainDcg(sys), s"dcg for query $q")
      assert(idcg === chainDcg(ideal), s"idcg for query $q")
      if (chainDcg(ideal) == 0.0) assert(ndcg.isEmpty, s"query $q")
      else assert(ndcg.get === dcg / idcg, s"ndcg for query $q")
    }
  }

  test("hit metrics match brute force, including the no-relevant nulls") {
    val got = RankingMetrics.hitsAtK(df, col("q_id"),
      col("gain") >= 2L, order, k).collect()
      .map(r => r.getAs[Long]("query") -> r).toMap
    rows.groupBy(_._1).foreach { case (q, its) =>
      val ranked = its.sortBy { case (_, item, score, _) => (-score, item) }
      val rel = ranked.map(_._4 >= 2L)
      val nRel = rel.count(identity).toLong
      val hits = rel.take(k).count(identity).toLong
      val first = rel.indexWhere(identity) match {
        case -1 => None
        case i  => Some(i + 1L)
      }
      val r = got(q)
      assert(r.getAs[Long]("n_rel") === nRel, s"query $q")
      assert(r.getAs[Long]("hits_at_k") === hits, s"query $q")
      assert(r.getAs[Double]("precision_at_k") === hits.toDouble / k)
      if (nRel == 0L) {
        assert(r.isNullAt(r.fieldIndex("recall_at_k")), s"query $q")
        assert(r.isNullAt(r.fieldIndex("first_hit_rank")), s"query $q")
        assert(r.isNullAt(r.fieldIndex("reciprocal_rank")), s"query $q")
      } else {
        assert(r.getAs[Double]("recall_at_k") === hits.toDouble / nRel)
        assert(r.getAs[Long]("first_hit_rank") === first.get, s"query $q")
        assert(r.getAs[Double]("reciprocal_rank") === 1.0 / first.get)
      }
    }
  }

  test("perfect ranking scores ndcg = 1, reversed ranking scores less") {
    import spark.implicits._
    val perfect = Seq((1L, 1L, 10L, 3L), (1L, 2L, 9L, 2L),
      (1L, 3L, 8L, 1L), (1L, 4L, 7L, 0L))
    val reversed = perfect.map { case (q, i, s, g) => (q, i, 10L - s, g) }
    def ndcgOf(xs: Seq[(Long, Long, Long, Long)]): Double =
      RankingMetrics.ndcgAtK(xs.toDF("q_id", "item", "score", "gain"),
        col("q_id"), col("gain"), order, k)
        .collect()(0).getAs[Double]("ndcg")
    assert(ndcgOf(perfect) === 1.0)
    assert(ndcgOf(reversed) < 1.0)
  }

  test("ndcg is invariant to the tiebreak among equal-gain items in the " +
    "ideal ordering") {
    import spark.implicits._
    val a = Seq((1L, 1L, 5L, 2L), (1L, 2L, 4L, 2L), (1L, 3L, 3L, 1L))
    // permute item ids among the equal-gain pair — ideal order flips,
    // the gain sequence (and so idcg) must not
    val b = Seq((1L, 2L, 5L, 2L), (1L, 1L, 4L, 2L), (1L, 3L, 3L, 1L))
    def idcgOf(xs: Seq[(Long, Long, Long, Long)]): Double =
      RankingMetrics.ndcgAtK(xs.toDF("q_id", "item", "score", "gain"),
        col("q_id"), col("gain"), order, k)
        .collect()(0).getAs[Double]("idcg")
    assert(idcgOf(a) === idcgOf(b))
  }

  test("plan shape: both rank windows and the aggregate ride ONE " +
    "exchange on the query key") {
    val plan = RankingMetrics.ndcgAtK(df, col("q_id"), col("gain"),
      order, k).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1,
      s"expected a single hash exchange, got $exchanges:\n$plan")
  }

  test("results are partitioning-invariant") {
    import spark.implicits._
    val one = rows.toDF("q_id", "item", "score", "gain").coalesce(1)
    val a = RankingMetrics.ndcgAtK(df, col("q_id"), col("gain"), order, k)
      .orderBy(col("query")).collect().toSeq
    val b = RankingMetrics.ndcgAtK(one, col("q_id"), col("gain"), order, k)
      .orderBy(col("query")).collect().toSeq
    assert(a === b)
  }
}
