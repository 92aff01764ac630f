package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SessionTimers]] — batch-sessionization differential under
  * chronological replay, timer-driven closes for idle keys, replay-
  * chunking invariance, and the exact gap-boundary convention. */
class SessionTimersSpec extends SparkSpec {

  private val gapUs = 1000000L // 1 s

  /** Stage (user, us, cents) rows into time-ordered chunk files and
    * run the sessionizer; sentinel closes everything at the end. */
  private def stream(
      rows: Seq[(Long, Long, Long)], chunkBounds: Seq[Long],
      name: String): Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    val maxUs = rows.map(_._2).max
    val all = rows :+ (-1L, maxUs + 3L * gapUs, 0L)
    val work = tmpDir(s"st-$name")
    val chunks = (Long.MinValue +: chunkBounds :+ Long.MaxValue)
      .sliding(2).toSeq
    chunks.foreach { case Seq(lo, hi) =>
      val part = all.filter(r => r._2 >= lo && r._2 < hi)
      if (part.nonEmpty) {
        part.map { case (u, us, c) =>
          (u, new java.sql.Timestamp(us / 1000L), us, c)
        }.toDF("user", "ts", "us", "cents")
          .repartition(1).write.mode("append").parquet(s"$work/stage")
        Thread.sleep(15)
      }
    }
    val src = spark.readStream
      .schema(spark.read.parquet(s"$work/stage").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/stage")
      .as[SessionTimers.SessEvent]
    SessionTimers.closedSessions(spark, src, gapUs, s"st_$name")
      .filter(col("user") >= 0L)
      .collect()
      .map(r => (r.getAs[Long]("user"), r.getAs[Long]("start_us")) ->
        (r.getAs[Long]("end_us"), r.getAs[Long]("n_events"),
          r.getAs[Long]("sum_cents")))
      .toMap
  }

  /** Driver-side batch sessionization, strictly-greater gap rule. */
  private def brute(rows: Seq[(Long, Long, Long)])
      : Map[(Long, Long), (Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.map(r => (r._2, r._3)).sortBy(identity)
      val sessions = sorted.tail.foldLeft(
        List(List(sorted.head))) { case (acc, e) =>
        if (e._1 - acc.head.head._1 > gapUs) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }
      sessions.map { s =>
        val us = s.map(_._1)
        (u, us.min) -> (us.max, s.size.toLong, s.map(_._2).sum)
      }
    }

  test("streamed sessions equal batch sessionization on a random " +
    "multi-user fixture") {
    val rnd = new scala.util.Random(127)
    var t = 1700000000000000L
    val rows = (0 until 200).map { _ =>
      t += (rnd.nextInt(30) + 1) * 100000L // 0.1-3 s steps
      ((rnd.nextInt(5)).toLong, t, rnd.nextInt(50).toLong)
    }
    val bounds = Seq(t - 12000000L, t - 6000000L, t - 2000000L)
    assert(stream(rows, bounds, "rand") === brute(rows))
  }

  test("an idle key's session closes by TIMER when other keys advance " +
    "the watermark") {
    // user 0: two early events, then silence; user 1 keeps the stream
    // (and so the watermark) moving in later chunks
    val rows = Seq(
      (0L, 1000000L, 5L), (0L, 1500000L, 7L),
      (1L, 1200000L, 1L), (1L, 5000000L, 1L), (1L, 9000000L, 1L))
    val got = stream(rows, Seq(3000000L, 7000000L), "idle")
    assert(got((0L, 1000000L)) === ((1500000L, 2L, 12L)),
      "user 0 must emit without any further user-0 event")
  }

  test("gap boundary: exactly gap apart extends, gap+1 splits") {
    val rows = Seq(
      (3L, 1000000L, 1L), (3L, 2000000L, 1L), // Δ = gap → same session
      (4L, 1000000L, 1L), (4L, 2000001L, 1L)) // Δ = gap+1 → split
    val got = stream(rows, Seq(1600000L), "gap")
    assert(got((3L, 1000000L)) === ((2000000L, 2L, 2L)))
    assert(got((4L, 1000000L)) === ((1000000L, 1L, 1L)))
    assert(got((4L, 2000001L)) === ((2000001L, 1L, 1L)))
  }

  test("replay-chunking invariance: different time-contiguous cuts " +
    "emit identical sessions") {
    val rnd = new scala.util.Random(131)
    var t = 1700000000000000L
    val rows = (0 until 120).map { _ =>
      t += (rnd.nextInt(25) + 1) * 100000L
      ((rnd.nextInt(3)).toLong, t, rnd.nextInt(9).toLong)
    }
    val a = stream(rows, Seq(t - 8000000L), "cutA")
    val b = stream(rows,
      Seq(t - 10000000L, t - 5000000L, t - 1000000L), "cutB")
    assert(a === b)
    assert(a === brute(rows))
  }
}
