package graft.popularity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PopularitySpec extends SparkSpec {

  test("approx popularity tracks exact distinct within the HLL rsd bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val listens = (1 to 20000).map { _ =>
      val e = s"e${rnd.nextInt(8)}"
      (rnd.nextInt(3000).toLong, e)
    }.toDF("user_id", "entity")
    val exact = Popularity.entity(listens, "user_id", Seq("entity"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Popularity.entityApprox(listens, "user_id", Seq("entity"),
        rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (e, n) =>
      val a = approx(e)
      assert(math.abs(a - n).toDouble / n < 0.2,
        s"entity $e: approx $a vs exact $n beyond 4x rsd")
    }
    // identical totals: the count side is exact in both variants
    val exactTotals = Popularity.entity(listens, "user_id", Seq("entity"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approxTotals = Popularity.entityApprox(listens, "user_id", Seq("entity"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exactTotals == approxTotals)
  }

  test("sketch partials persist, merge in any order, and track exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 30000).map { _ =>
      (s"e${rnd.nextInt(5)}", rnd.nextInt(4000).toLong)
    }.toDF("entity", "user_id")
    val chunks = (0 until 4).map(c =>
      rows.filter(pmod(col("user_id"), lit(4)) === c))
    val work = java.nio.file.Files
      .createTempDirectory("graft-sketch-spec").toString
    chunks.zipWithIndex.foreach { case (c, i) =>
      SketchDistinct.partial(c, Seq("entity"), "user_id")
        .write.parquet(s"$work/p$i")
    }
    // merge order must not matter: read increments in reverse
    val partials = spark.read.parquet(
      s"$work/p3", s"$work/p1", s"$work/p0", s"$work/p2")
    val served = SketchDistinct.serve(partials, Seq("entity"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exact = rows.groupBy("entity")
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(served.keySet == exact.keySet)
    exact.foreach { case (e, (d, n)) =>
      val (est, nTot) = served(e)
      assert(nTot == n, s"$e: merged counts must be exact")
      assert(math.abs(est - d).toDouble / d < 0.1,
        s"$e: estimate $est vs exact $d beyond envelope")
    }
    // a NEW increment refines the estimate without touching old chunks:
    // serving parts 0-2 then adding part 3 equals serving all four
    val first3 = spark.read.parquet(s"$work/p0", s"$work/p1", s"$work/p2")
    val incr = SketchDistinct.serve(
      first3.unionByName(spark.read.parquet(s"$work/p3")), Seq("entity"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all4 = served.map { case (k, (est, _)) => k -> est }
    assert(incr == all4, "incremental union must equal the full merge")
    intercept[IllegalArgumentException](
      SketchDistinct.partial(rows, Seq.empty, "user_id"))
    intercept[IllegalArgumentException](
      SketchDistinct.partial(rows, Seq("entity"), "user_id", lgK = 2))
  }
}
