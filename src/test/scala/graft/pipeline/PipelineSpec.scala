package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Media
import graft.recs.{Als, ModelLedger}
import graft.streaming.StreamingStats
import graft.engine.{Listen, TopEntityStats}

/** Multimodal plumbing, ALS pipeline, and the streaming stats surface. */
class PipelineSpec extends SparkSpec {

  test("media features: deterministic stub decode over binary payloads") {
    import spark.implicits._
    val docs = Seq((1L, "hello world", "en", "s", 11L),
      (2L, "hello world", "en", "s", 11L),
      (3L, "different text", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Media.extractFeatures(Media.fromDocuments(docs)).collect()
    assert(feats.length == 3)
    val byId = feats.map(f => f.id -> f).toMap
    assert(byId(1L).payload_hash == byId(2L).payload_hash,
      "same payload → same features")
    assert(byId(1L).payload_hash != byId(3L).payload_hash)
    assert(byId(1L).byte_len == 11)
  }

  test("stream-stream interval join: window bounds, key isolation, order") {
    import graft.streaming.StreamJoins
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val errors = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamJoins.intervalJoin(
      clicks.toDF().toDF("user_id", "click_ts", "click_id"),
      errors.toDF().toDF("user_id", "err_ts", "err_id"),
      "user_id", "click_ts", "err_ts", "30 MINUTE", "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sj_out").start()

    clicks.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 11:00:00"), 2L),
      (2L, ts("2024-01-01 10:00:00"), 3L))
    q.processAllAvailable()
    errors.addData(
      (1L, ts("2024-01-01 10:15:00"), 10L), // in window of click 1
      (1L, ts("2024-01-01 11:45:00"), 11L), // 45 min after click 2: out
      (2L, ts("2024-01-01 09:50:00"), 12L), // before the click: out
      (2L, ts("2024-01-01 10:30:00"), 14L), // exactly +30 min: boundary in
      (3L, ts("2024-01-01 10:05:00"), 13L)) // no such click user
    q.processAllAvailable()

    val got = spark.table("sj_out")
      .select(col("user_id"), col("click_id"), col("err_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, 1L, 10L), (2L, 3L, 14L)))
    q.stop()

    intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(
        clicks.toDF().toDF("user_id", "t", "a"),
        errors.toDF().toDF("user_id", "t", "b"),
        "user_id", "t", "t", "30 MINUTE", "1 hour")
    }
  }

  test("streaming sessionization: gap rolls sessions, timeout flushes state") {
    import graft.streaming.StreamingSessions
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[StreamingSessions.Listen]
    val out = StreamingSessions.sessionize(in.toDS(), gapMinutes = 30,
      watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    def l(u: Int, at: String, e: String) =
      StreamingSessions.Listen(u, ts(at), e)

    // session 1: two listens 10 min apart; then a 2h gap rolls session 2
    in.addData(
      l(1, "2024-01-01 10:00:00", "A"), l(1, "2024-01-01 10:10:00", "B"))
    q.processAllAvailable()
    in.addData(l(1, "2024-01-01 12:30:00", "C"))
    q.processAllAvailable()
    val closed = spark.table("sessions_out")
      .as[StreamingSessions.Session].collect()
    assert(closed.length == 1, "first session closed by the gap")
    assert(closed.head.n_listens == 2 && closed.head.n_entities == 2)
    assert(closed.head.session_start == ts("2024-01-01 10:00:00"))
    assert(closed.head.session_end == ts("2024-01-01 10:10:00"))

    // advancing the watermark past the gap horizon times out session 2
    in.addData(l(2, "2024-01-01 18:00:00", "Z"))
    q.processAllAvailable()
    in.addData(l(2, "2024-01-01 19:00:00", "Z"))
    q.processAllAvailable()
    val all = spark.table("sessions_out")
      .as[StreamingSessions.Session].collect()
    val u1 = all.filter(_.user_id == 1)
    assert(u1.length == 2, s"session 2 flushed by event-time timeout: ${all.toSeq}")
    assert(u1.map(_.n_listens).sorted.toSeq == Seq(1L, 2L))
    q.stop()
  }

  test("streaming windowed activity honors the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, java.sql.Timestamp)]
    val df = in.toDS().toDF("user_id", "ts")
    val out = StreamingStats.windowedActivity(
      df, "user_id", "ts", "1 hour", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("windowed_out").start()
    in.addData((1, ts("2024-01-01 10:05:00")), (1, ts("2024-01-01 10:40:00")))
    q.processAllAvailable()
    // watermark (max 10:40 - 10m = 10:30) has not passed the 11:00 window
    // end yet → nothing emitted
    assert(spark.table("windowed_out").count() == 0)
    in.addData((1, ts("2024-01-01 11:25:00")))
    q.processAllAvailable()
    in.addData((1, ts("2024-01-01 12:30:00")))
    q.processAllAvailable()
    val rows = spark.table("windowed_out").collect()
    assert(rows.map(r => (r.getTimestamp(1).toString, r.getLong(2))).toSet ==
      Set(("2024-01-01 10:00:00.0", 2L), ("2024-01-01 11:00:00.0", 1L)))
    q.stop()
  }

  test("ALS recommends the dominant co-preference item") {
    import spark.implicits._
    // users 1..20 split into two taste groups with disjoint items;
    // user 1 (group A) must be recommended unseen group-A items over
    // group-B items
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20).flatMap { u =>
      val group = if (u <= 10) "a" else "b"
      val items = (1 to 8).map(i => s"$group$i")
      // each user plays 6 of their group's 8 items
      rnd.shuffle(items).take(6).flatMap(it => Seq.fill(3)((u.toLong, it)))
    }
    val listens = rows.toDF("user_id", "item")
    val pc = Als.buildPlaycounts(listens, "user_id", "item")
    val model = Als.train(pc, rank = 4, maxIter = 5)
    val recs = Als.recommend(model, pc, k = 3)
    val items = Als.denseIds(listens, "item", "als_item_id")
    val userIds = Als.denseIds(listens, "user_id", "als_user_id")
    val labeled = recs
      .join(items, Seq("als_item_id")).join(userIds, Seq("als_user_id"))
    val groupA = labeled.filter(col("user_id") <= 10)
      .select("item").collect().map(_.getString(0))
    val aShare = groupA.count(_.startsWith("a")).toDouble / groupA.length
    assert(aShare > 0.8, s"group-A users mostly get group-A items ($aShare)")

    // model persistence round-trip (reference persists ALSModel in HDFS
    // between the train and recommend requests)
    val dir = tmpDir("als-model")
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.recommendation.ALSModel.load(dir)
    val again = Als.recommend(reloaded, pc, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(again == recs.collect().map(_.toString).sorted.toSeq)
  }

  test("ALS grid search selects a model via 2-fold CV") {
    import spark.implicits._
    val rows = (1 to 12).flatMap { u =>
      (1 to 4).map(i => (u.toLong, s"it${(u + i) % 6}"))
    }
    val pc = Als.buildPlaycounts(rows.toDF("user_id", "item"), "user_id", "item")
    val grid = Als.trainWithGridDetailed(pc,
      ranks = Seq(2, 4), regParams = Seq(0.1), alphas = Seq(3.0))
    assert(Seq(2, 4).contains(grid.model.rank))
    assert(grid.rank == grid.model.rank,
      "reported winning rank matches the selected model")
    assert(grid.regParam == 0.1 && grid.alpha == 3.0)
    assert(grid.validationRmse > 0.0 && !grid.validationRmse.isNaN)
    assert(grid.model.transform(pc).count() > 0)

    // ledger round-trip: the saved model's metadata row records the
    // winning params and validation RMSE (train_models.py:236-250)
    val ledgerPath = tmpDir("als-ledger") + "/model-metadata"
    ModelLedger.append(spark, ledgerPath,
      ModelLedger.entryFor("model-1", "df-1", grid, pc))
    val back = ModelLedger.read(spark, ledgerPath).collect()
    assert(back.length == 1)
    val r = back(0)
    assert(r.getAs[String]("model_id") == "model-1")
    assert(r.getAs[Int]("rank") == grid.rank)
    assert(r.getAs[Double]("lmbda") == grid.regParam)
    assert(r.getAs[Double]("alpha") == grid.alpha)
    assert(r.getAs[Double]("validation_rmse") == grid.validationRmse)
    assert(r.getAs[Long]("users_count") == 12L)
    assert(r.getAs[Long]("playcounts_count") == pc.count())

    // append-only: a second model adds a row, never replaces
    ModelLedger.append(spark, ledgerPath,
      ModelLedger.entryFor("model-2", "df-1", grid, pc))
    assert(ModelLedger.read(spark, ledgerPath).count() == 2)
  }

  test("seeded ALS fit validates inside the recorded RMSE interval") {
    import spark.implicits._
    // fixture with learnable structure AND varying labels: two disjoint
    // taste groups, each user plays every group item (u+i)%5+1 times, so
    // confidence spans 1..5 instead of a degenerate constant
    val rows = (1 to 24).flatMap { u =>
      val group = if (u <= 12) "a" else "b"
      (1 to 8).flatMap { i =>
        Seq.fill((u + i) % 5 + 1)((u.toLong, s"$group$i"))
      }
    }
    val pc = Als.buildPlaycounts(rows.toDF("user_id", "item"),
      "user_id", "item")
    val rmse = Als.validationRmse(pc)
    info(s"seeded validation RMSE = $rmse")
    // the quantitative gate the reference's model selection rests on
    // (train_models.py:152-179): the seeded 5:1-split fit on this corpus
    // validates at 2.989 RMSE (implicit ALS predicts preference in [0,1]
    // against confidence 1..5, so the absolute level is dominated by the
    // scale gap — the metric is comparative, exactly as the reference
    // uses it). The ±12% interval is wide enough for partitioning jitter
    // yet tight enough that a broken confidence transform, degenerate
    // fit, or id-assignment bug trips it.
    assert(rmse.isFinite, s"degenerate RMSE $rmse")
    assert(rmse >= RmseLo && rmse <= RmseHi,
      s"seeded fit RMSE $rmse outside recorded [$RmseLo, $RmseHi]")
  }
  private val RmseLo = 2.63
  private val RmseHi = 3.35

  test("streaming partial aggregation matches batch stats") {
    val dir = tmpDir("stream-src")
    val ls = Seq(
      listen(1, "A", "2024-01-01 10:00:00"),
      listen(1, "A", "2024-01-01 11:00:00"),
      listen(1, "B", "2024-01-01 12:00:00"),
      listen(2, "C", "2024-01-02 10:00:00"))
    listensDf(ls).write.mode("overwrite").parquet(dir)

    val provider = TopEntityStats("user_id", Seq("artist_name"), top = 5)
    val q = StreamingStats.maintainPartial(
      spark, provider, dir, Listen.schema, "stream_partial", "listened_at")
    q.awaitTermination(60000)

    val streamed = StreamingStats.statsSnapshot(spark, provider, "stream_partial")
      .collect().map(_.toString).sorted.toSeq
    val batch = provider.stats(provider.aggregate(listensDf(ls)))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming ingest feeds the incremental store, micro-batch = dump chunk") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val store = new graft.engine.ListenStore(spark, tmpDir("stream-store"))
    store.writeBase(listensDf(Seq(
      listen(1, "A", "2024-01-01 10:00:00", created = "2024-01-02 00:00:00"))))
    assert(store.highWater.map(_._1) == Some(ts("2024-01-01 10:00:00")))

    val in = MemoryStream[graft.engine.Listen]
    val q = graft.streaming.StreamingIngest.intoStore(
      in.toDS().toDF(), store, tmpDir("stream-ckpt"),
      trigger = Trigger.ProcessingTime(0))
    try {
      in.addData(
        listen(1, "B", "2024-03-05 09:00:00", created = "2024-03-06 00:00:00"),
        listen(2, "C", "2024-03-05 10:00:00", created = "2024-03-06 00:00:00"))
      q.processAllAvailable()
      assert(store.incrementalListens.count() == 2)
      // each micro-batch advances the high-water like an incremental dump
      assert(store.highWater.map(_._1) == Some(ts("2024-03-05 10:00:00")))

      in.addData(
        listen(2, "D", "2024-03-07 08:00:00", created = "2024-03-08 00:00:00"))
      q.processAllAvailable()
      assert(store.incrementalListens.count() == 3)
      assert(store.highWater ==
        Some((ts("2024-03-07 08:00:00"), ts("2024-03-08 00:00:00"))))

      // the batch engine reads streamed listens like any dump chunk
      val window = store.listens(
        ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00"))
      assert(window.count() == 4)
    } finally q.stop()
  }

  test("streaming ingest replays are idempotent per batch id") {
    // foreachBatch is at-least-once: simulate a post-crash replay by
    // invoking the sink function twice with the same batch id
    val store = new graft.engine.ListenStore(spark, tmpDir("replay-store"))
    val markers = tmpDir("replay-markers")
    val chunk = listensDf(Seq(
      listen(1, "A", "2024-03-05 09:00:00", created = "2024-03-06 00:00:00")))
    graft.streaming.StreamingIngest.appendBatch(store, markers)(chunk, 7L)
    graft.streaming.StreamingIngest.appendBatch(store, markers)(chunk, 7L)
    assert(store.incrementalListens.count() == 1,
      "replayed batch id must not double-append")
    // a NEW batch id still appends
    graft.streaming.StreamingIngest.appendBatch(store, markers)(chunk, 8L)
    assert(store.incrementalListens.count() == 2)
  }

  test("streaming source dedup drops redelivered rows within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val in = MemoryStream[(Int, java.sql.Timestamp, String)]
    val out = graft.streaming.StreamingIngest.dedupWithinWatermark(
      in.toDS().toDF("user_id", "ts", "entity"),
      "ts", watermark = "10 minutes", idCols = Seq("user_id", "ts", "entity"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    // batch 1: a row plus its same-batch duplicate
    in.addData((1, ts("2024-01-01 10:00:00"), "A"),
      (1, ts("2024-01-01 10:00:00"), "A"),
      (2, ts("2024-01-01 10:01:00"), "B"))
    q.processAllAvailable()
    // batch 2: cross-batch redelivery of user 1's row (within the
    // watermark) plus one genuinely new row
    in.addData((1, ts("2024-01-01 10:00:00"), "A"),
      (3, ts("2024-01-01 10:02:00"), "C"))
    q.processAllAvailable()

    val rows = spark.table("dedup_out")
      .as[(Int, java.sql.Timestamp, String)].collect().toSeq
    assert(rows.size == 3, s"redeliveries dropped: $rows")
    assert(rows.map(_._1).sorted == Seq(1, 2, 3))
    // a row differing in ANY identity column is not a duplicate
    in.addData((1, ts("2024-01-01 10:00:00"), "A2"))
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() == 4)
    q.stop()
  }
}
