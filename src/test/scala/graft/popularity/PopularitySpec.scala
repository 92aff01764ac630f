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
}
