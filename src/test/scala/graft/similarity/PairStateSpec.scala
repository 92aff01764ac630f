package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PairStateSpec extends SparkSpec {

  private def events = {
    import spark.implicits._
    // users straddle the item split: batches collide with existing
    // presence (the hard incremental case), with replayed duplicates
    val rows = for {
      u <- 1 to 12
      i <- 1 to 20
      if (u * 7 + i * 3) % 4 != 0
      rep <- 0 to (u + i) % 3 // multiplicities — presence must dedupe
    } yield (u.toLong, i.toLong)
    rows.toDF("user_id", "item_id")
  }

  test("incremental state ≡ full single-pass PMI across two batches " +
      "and a forced compaction") {
    val ev = events
    val base = ev.filter(col("item_id") < 10)
    val b1 = ev.filter(col("item_id") >= 10 && col("item_id") < 15)
    val b2 = ev.filter(col("item_id") >= 15)
    val work = tmpDir("pairstate")
    val st = PairState.create(spark, s"$work/st", base,
      "user_id", "item_id", buckets = 8)
    st.applyBatch(b1, "user_id", "item_id", compactFraction = 1e12)
    st.compact()
    st.applyBatch(b2, "user_id", "item_id", compactFraction = 1e12)
    val got = Cooccurrence.scoreCounts(st.pairs(), st.presence(),
        minBoth = 2)
      .orderBy(col("item_a"), col("item_b")).collect().toSeq
    val want = Cooccurrence.pmi(ev, "user_id", "item_id", minBoth = 2)
      .orderBy(col("item_a"), col("item_b")).collect().toSeq
    assert(got == want)
  }

  test("a fully-replayed batch is a no-op segment") {
    val ev = events
    val base = ev.filter(col("item_id") < 15)
    val batch = ev.filter(col("item_id") >= 15)
    val work = tmpDir("pairstate-replay")
    val st = PairState.create(spark, s"$work/st", base,
      "user_id", "item_id", buckets = 4)
    val n1 = st.applyBatch(batch, "user_id", "item_id",
      compactFraction = 1e12)
    assert(n1 > 0)
    val before = st.pairs().orderBy(col("item_a"), col("item_b"))
      .collect().toSeq
    val n2 = st.applyBatch(batch, "user_id", "item_id",
      compactFraction = 1e12)
    assert(n2 == 0L)
    val after = st.pairs().orderBy(col("item_a"), col("item_b"))
      .collect().toSeq
    assert(before == after)
  }

  test("compaction rewrites only the pk partitions the segments touch") {
    import spark.implicits._
    val base = (for { u <- 1 to 10; i <- 1 to 10 } yield (u.toLong,
      i.toLong)).toDF("user_id", "item_id")
    val work = tmpDir("pairstate-touch")
    val st = PairState.create(spark, s"$work/st", base,
      "user_id", "item_id", buckets = 16)
    def baseFiles(): Map[String, Set[String]] = {
      val root = java.nio.file.Paths.get(s"$work/st/base")
      val s0 = java.nio.file.Files.list(root)
      try s0.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("pk="))
        .map { d =>
          val s1 = java.nio.file.Files.list(d)
          try d.getFileName.toString ->
            s1.iterator().asScala.map(_.getFileName.toString)
              .filter(_.endsWith(".parquet")).toSet
          finally s1.close()
        }.toMap
      finally s0.close()
    }
    val filesBefore = baseFiles()
    // one brand-new item for one user: the delta is exactly the pairs
    // (new item × that user's existing items) — few pks touched
    val batch = Seq((1L, 99L)).toDF("user_id", "item_id")
    st.applyBatch(batch, "user_id", "item_id", compactFraction = 1e12)
    val touched = spark.read.parquet(s"$work/st/seg/s0")
      .select(col("pk")).distinct().count()
    assert(touched < 16, "fixture should not touch every bucket")
    st.compact()
    val filesAfter = baseFiles()
    val changed = filesAfter.keySet.union(filesBefore.keySet)
      .count(k => filesBefore.get(k) != filesAfter.get(k))
    assert(changed.toLong == touched,
      s"expected exactly $touched rewritten pk dirs, got $changed")
    // the segment log is folded away and reads hit the base alone
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$work/st/seg/s0")))
    assert(st.pairs().count() == st.baseRows)
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
