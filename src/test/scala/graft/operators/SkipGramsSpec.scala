package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SkipGrams.pairs]] — brute-force window definition, symmetry,
  * entity isolation, and the single-Window plan shape. */
class SkipGramsSpec extends SparkSpec {

  private val stream: Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(23)
    for {
      u <- 1L to 12L
      i <- 1L to (3 + rnd.nextInt(20)).toLong
    } yield (u, i, "abcde" (rnd.nextInt(5)).toString)
  }

  private def got(w: Int) = {
    import spark.implicits._
    SkipGrams.pairs(
      stream.toDF("u", "pos", "item").repartition(7),
      col("u"), Seq(col("pos")), col("item"), window = w)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  private def brute(w: Int): Map[(String, String), Long] =
    stream.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val items = rows.sortBy(_._2).map(_._3)
      for {
        i <- items.indices
        j <- items.indices
        if i != j && math.abs(i - j) <= w
      } yield (items(i), items(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("pairs match the brute-force |pos_i - pos_j| <= w definition") {
    assert(got(1) === brute(1))
    assert(got(2) === brute(2))
    assert(got(4) === brute(4))
  }

  test("pair counts are symmetric and never cross entities") {
    val m = got(2)
    m.foreach { case ((a, b), c) => assert(m((b, a)) === c) }
    import spark.implicits._
    // two entities with disjoint vocabularies: no cross pairs
    val iso = Seq((1L, 1L, "x"), (1L, 2L, "x"), (2L, 1L, "y"),
      (2L, 2L, "y")).toDF("u", "pos", "item")
    val pairs = SkipGrams.pairs(iso, col("u"), Seq(col("pos")),
      col("item"), 2).collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet === Set(("x", "x"), ("y", "y")))
  }

  test("plan contains exactly one Window node (all 2w lags share the " +
    "WindowSpec)") {
    import spark.implicits._
    val plan = SkipGrams.pairs(
      stream.toDF("u", "pos", "item"), col("u"), Seq(col("pos")),
      col("item"), window = 3)
      .queryExecution.optimizedPlan.toString()
    assert("(?s)Window".r.findAllIn(plan).size === 1)
  }
}
