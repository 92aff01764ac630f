package graft.queries

import graft.SparkSpec
import graft.operators.FrequentItemsets

class FrequentItemsetsSpec extends SparkSpec {
  import spark.implicits._

  test("planted baskets: supports, confidence, lift are exact; " +
    "infrequent items are pruned before pairing") {
    // baskets: {a,b,c} {a,b} {a,b} {a,z} {c}  — z appears once
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"), // duplicate (3,b) collapses
      (4L, "a"), (4L, "z"),
      (5L, "c")).toDF("b", "i")
    val got = FrequentItemsets.rules(rows, "b", "i", minSupport = 2L)
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // frequent: a(4), b(3), c(2); pairs with support>=2: (a,b)=3
    // (a,c)=1 and (b,c)=1 fall below minSupport; z pruned at level 1
    assert(got.keySet == Set("a" -> "b", "b" -> "a"))
    val ab = got("a" -> "b")
    assert(ab._3 == 3L && ab._4 == 4L && ab._5 == 3L && ab._6 == 5L)
    assert(ab._7 == 3.0 / 4.0)                  // confidence a->b
    assert(ab._8 == (5.0 * 3.0) / (4.0 * 3.0))  // lift symmetric
    val ba = got("b" -> "a")
    assert(ba._7 == 3.0 / 3.0 && ba._8 == ab._8)
  }

  test("null items are dropped; empty result on high support") {
    val rows = Seq((1L, "a"), (1L, null.asInstanceOf[String]), (2L, "a"))
      .toDF("b", "i")
    assert(FrequentItemsets.rules(rows, "b", "i", 3L).count() == 0)
    intercept[IllegalArgumentException](
      FrequentItemsets.rules(rows, "b", "i", 0L))
  }
}
