package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SequencePack.pack]] — independent-md5 brute-force differential
  * and the packing invariants (full bins, tiling, zero waste). */
class SequencePackSpec extends SparkSpec {

  private val L = 100L

  private def run(docs: Seq[(Long, Long)]) = {
    import spark.implicits._
    SequencePack.pack(docs.toDF("id", "n").repartition(5), col("id"),
      col("n"), L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seg_offset"), r.getAs[Long]("doc_offset"),
        r.getAs[Long]("seg_len")))
      .toSet
  }

  private def md5hex(s: String): String = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    mdi.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Driver-side replay: same order key, one running offset. */
  private def brute(docs: Seq[(Long, Long)]) = {
    var cum = 0L
    docs.filter(_._2 > 0L)
      .sortBy { case (id, _) => (md5hex(s"$id:pack"), id) }
      .flatMap { case (id, n) =>
        val start = cum
        cum += n
        (start / L to (cum - 1) / L).map { b =>
          (id, b, math.max(start, b * L) - b * L,
            math.max(0L, b * L - start),
            math.min(cum, (b + 1) * L) - math.max(start, b * L))
        }
      }.toSet
  }

  test("the offset plan replays an independent driver-side packing " +
    "exactly, splits across cuts included") {
    val rnd = new scala.util.Random(149)
    val docs = (0L until 80L).map(i => (i, rnd.nextInt(250).toLong))
    assert(run(docs) === brute(docs))
  }

  test("packing invariants: every sequence but the last is exactly " +
    "full, documents tile completely, offsets tile each bin") {
    val rnd = new scala.util.Random(151)
    val docs = (0L until 60L).map(i => (i, (rnd.nextInt(180) + 1).toLong))
    val plan = run(docs).toSeq
    val total = docs.map(_._2).sum
    // per-document tiling: segments reassemble the document exactly
    docs.foreach { case (id, n) =>
      val segs = plan.filter(_._1 == id).sortBy(_._4)
      assert(segs.map(_._5).sum === n, s"doc $id")
      assert(segs.head._4 === 0L, s"doc $id starts at offset 0")
      segs.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 === b._4, s"doc $id gap")
        case _ =>
      }
    }
    // per-bin budget: full bins everywhere but the tail, no overlap
    val lastBin = plan.map(_._2).max
    plan.groupBy(_._2).foreach { case (bin, segs) =>
      val used = segs.map(_._5).sum
      if (bin < lastBin) assert(used === L, s"bin $bin")
      else assert(used === total - lastBin * L, s"tail bin")
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"bin $bin starts at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._5 === b._3, s"bin $bin gap")
        case _ =>
      }
    }
  }

  test("zero-length documents are excluded; a doc longer than the " +
    "sequence spans multiple full bins") {
    val plan = run(Seq((1L, 0L), (2L, 350L))).toSeq
    assert(plan.forall(_._1 == 2L))
    assert(plan.map(_._2).sorted === Seq(0L, 1L, 2L, 3L))
    assert(plan.map(s => s._5).sum === 350L)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(157)
    val docs = (0L until 50L).map(i => (i, rnd.nextInt(99).toLong + 1L))
    def at(parts: Int) = SequencePack.pack(
      docs.toDF("id", "n").repartition(parts), col("id"), col("n"), L)
      .orderBy(col("seq_id"), col("seg_offset")).collect().toSeq
    assert(at(1) === at(8))
  }
}
