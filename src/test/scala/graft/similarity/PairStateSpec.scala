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

  test("endurance: ~20 batches with ORGANIC compaction triggers stay " +
      "exact at every step") {
    import spark.implicits._
    val ev = events
    // 21 slices: a small seed base + 20 per-item batches, so the
    // accumulated segment volume crosses the default threshold several
    // times mid-stream (organic compactions, not forced ones)
    val base = ev.filter(col("item_id") <= 2)
    val work = tmpDir("pairstate-endure")
    val st = PairState.create(spark, s"$work/st", base,
      "user_id", "item_id", buckets = 8)
    var compactions = 0
    (3 to 20).foreach { i =>
      val upto = ev.filter(col("item_id") <= i)
      val n = st.applyBatch(ev.filter(col("item_id") === i),
        "user_id", "item_id", compactFraction = 0.25)
      val segsAfter = {
        val p = java.nio.file.Paths.get(s"$work/st/seg")
        if (!java.nio.file.Files.exists(p)) 0
        else { val s = java.nio.file.Files.list(p)
          try s.iterator().asScala.size finally s.close() }
      }
      if (n > 0 && segsAfter == 0) compactions += 1
      val got = Cooccurrence.scoreCounts(st.pairs(), st.presence(),
          minBoth = 2)
        .orderBy(col("item_a"), col("item_b")).collect().toSeq
      val want = Cooccurrence.pmi(upto, "user_id", "item_id", minBoth = 2)
        .orderBy(col("item_a"), col("item_b")).collect().toSeq
      assert(got == want, s"divergence after batch item_id=$i")
    }
    assert(compactions >= 2,
      s"fixture should trigger organic compactions, saw $compactions")
  }

  test("open() repairs a crash mid-compaction-swap (marker present, " +
      "some partitions swapped, segments not yet consumed)") {
    val ev = events
    val base = ev.filter(col("item_id") < 12)
    val batch = ev.filter(col("item_id") >= 12)
    val work = tmpDir("pairstate-crash")
    val stPath = s"$work/st"
    val st = PairState.create(spark, stPath, base,
      "user_id", "item_id", buckets = 8)
    st.applyBatch(batch, "user_id", "item_id", compactFraction = 1e12)
    val segs = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$stPath/seg"))
      try s.iterator().asScala.map(_.toString).toSeq.sorted finally s.close()
    }
    // replicate compact()'s fold into the scratch dir, but CRASH the
    // swap by hand: marker durable, one pk fully swapped, one pk
    // aside-only, the rest untouched — then reopen and let repair run
    val segDf = spark.read.parquet(segs: _*)
    val touched = segDf.select(col("pk")).distinct()
      .collect().map(_.getAs[Number](0).longValue()).sorted
    assert(touched.length >= 3, "fixture needs >=3 touched pks")
    val tmp = s"$stPath/compact-tmp"
    spark.read.parquet(s"$stPath/base")
      .filter(col("pk").isin(touched.map(Long.box): _*))
      .unionByName(segDf)
      .groupBy(col("item_a"), col("item_b"), col("pk"))
      .agg(sum(col("users_both")).as("users_both"))
      .write.partitionBy("pk").parquet(tmp)
    val props = new java.util.Properties()
    props.setProperty("touched", touched.mkString(","))
    props.setProperty("segs", segs.mkString(","))
    val out = new java.io.FileOutputStream(s"$stPath/compact-marker")
    try props.store(out, null) finally out.close()
    def mv(a: String, b: String): Unit = java.nio.file.Files.move(
      java.nio.file.Paths.get(a), java.nio.file.Paths.get(b))
    // pk A: swap fully done (staged gone, aside still lingering)
    val a = touched(0)
    mv(s"$stPath/base/pk=$a", s"$stPath/base/pk=$a.old")
    mv(s"$tmp/pk=$a", s"$stPath/base/pk=$a")
    // pk B: crashed between aside and install (staged + aside, no dst)
    val b = touched(1)
    mv(s"$stPath/base/pk=$b", s"$stPath/base/pk=$b.old")
    val reopened = PairState.open(spark, stPath)
    // repair consumed the segments, dropped marker/scratch/asides
    for (leftover <- Seq("seg/s0", "compact-tmp", "compact-marker",
        s"base/pk=$a.old", s"base/pk=$b.old"))
      assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$stPath/$leftover")),
        s"$leftover should be gone after repair")
    val got = Cooccurrence.scoreCounts(reopened.pairs(),
        reopened.presence(), minBoth = 2)
      .orderBy(col("item_a"), col("item_b")).collect().toSeq
    val want = Cooccurrence.pmi(ev, "user_id", "item_id", minBoth = 2)
      .orderBy(col("item_a"), col("item_b")).collect().toSeq
    assert(got == want)
    assert(reopened.baseRows == reopened.pairs().count())
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
