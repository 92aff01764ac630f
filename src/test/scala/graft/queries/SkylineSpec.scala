package graft.queries

import graft.SparkSpec
import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Double, Double)], buckets: Int = 8): Set[(Double, Double)] =
    Skyline.frontier2D(pts.toDF("x", "y"), "x", "y", buckets)
      .as[(Double, Double)].collect().toSet

  test("frontier equals the quadratic dominance definition") {
    val pts = Seq(
      (1.0, 9.0), (2.0, 8.0), (3.0, 7.5), (3.0, 9.5), (4.0, 1.0),
      (5.0, 5.0), (6.0, 4.0), (7.0, 4.5), (8.0, 2.0), (9.0, 0.5))
    assert(run(pts) == brute(pts))
  }

  test("duplicates collapse; equal points survive as one frontier point") {
    val pts = Seq((5.0, 5.0), (5.0, 5.0), (1.0, 1.0))
    assert(run(pts) == Set((5.0, 5.0)))
  }

  test("equal-x column keeps only the max-y point; equal-y row only max-x") {
    val pts = Seq((2.0, 1.0), (2.0, 3.0), (2.0, 2.0), (1.0, 3.0))
    assert(run(pts) == Set((2.0, 3.0)))
  }

  test("degenerate single-x input survives the width-0 guard") {
    val pts = Seq((4.0, 1.0), (4.0, 2.0), (4.0, 9.0))
    assert(run(pts) == Set((4.0, 9.0)))
  }

  test("empty and all-null inputs yield an empty frontier, not an NPE") {
    assert(run(Seq.empty) == Set.empty)
    val allNull = Seq[(Option[Double], Option[Double])](
      (None, Some(1.0)), (Some(2.0), None), (None, None))
      .toDF("x", "y")
    val out = Skyline.frontier2D(allNull, "x", "y", 8)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 0)
  }

  test("randomized differential across bucket counts") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    val expect = brute(pts)
    for (b <- Seq(1, 4, 64, 1024)) assert(run(pts, b) == expect, s"buckets=$b")
  }
}
