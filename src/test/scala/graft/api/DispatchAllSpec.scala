package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine._

/** Drives EVERY dispatchable name (query_map.py parity, Dispatch.names)
  * end-to-end through a fixture store + metadata caches — the breadth
  * check that each reference job family is reachable from the API, not
  * just present as a library. */
class DispatchAllSpec extends SparkSpec {
  import spark.implicits._

  private def l(u: Int, artist: String, at: String, rec: String,
      rel: String, mbid: String) =
    listen(u, artist, at, Some(Seq(mbid)), msid = s"msid-$at-$u")
      .copy(recording_mbid = Some(rec), release_mbid = Some(rel),
        recording_name = s"name-$rec")

  // 3 users × 6 recordings × 2 artists over 2023-2024; r4 is the only
  // recording with 2023 (pre-YIM-year) listens, Artist0/am0 the only
  // artist credited on them
  private lazy val spread = (1 to 60).map { i =>
    val u = i % 3 + 1
    val rec = s"r${i % 6}"
    val year = if (i % 4 == 0) 2023 else 2024
    l(u, s"Artist${i % 2}", f"$year-${i % 12 + 1}%02d-${i % 28 + 1}%02d 0${i % 10}:00:00",
      rec, s"rel${i % 4}", s"am${i % 2}")
  }
  // clustered sessions: (Artist0, Artist1) and (r0, r1) co-occur twice
  private lazy val sessions = Seq(
    l(1, "Artist0", "2024-06-01 10:00:00", "r0", "rel0", "am0"),
    l(1, "Artist1", "2024-06-01 10:05:00", "r1", "rel1", "am1"),
    l(2, "Artist0", "2024-06-02 11:00:00", "r0", "rel0", "am0"),
    l(2, "Artist1", "2024-06-02 11:05:00", "r1", "rel1", "am1"))
  // unmapped listens (no recording_mbid): the missing-MB-data input
  private lazy val unmapped = Seq(
    l(1, "Garage Band", "2024-07-01 09:00:00", "x", "rel0", "am0")
      .copy(recording_mbid = None, recording_name = "demo tape"),
    l(2, "Garage Band", "2024-07-02 09:30:00", "x", "rel0", "am0")
      .copy(recording_mbid = None, recording_name = "demo tape"))
  private lazy val fixture = spread ++ sessions ++ unmapped

  private lazy val store: ListenStore = {
    val s = new ListenStore(spark, tmpDir("dispatch-all-store"))
    s.writeBase(listensDf(fixture))
    s
  }

  private lazy val caches = Dispatch.Caches(
    genres = Seq(("r0", "rock"), ("r1", "jazz"), ("r2", "rock"),
      ("r3", "pop"), ("r4", "jazz")).toDF("recording_mbid", "genre"),
    releases = Seq(("rel0", "rg0"), ("rel1", "rg1"), ("rel2", "rg0"),
      ("rel3", "rg2")).toDF("release_mbid", "release_group_mbid"),
    releaseGroups = Seq(("rg0", 1991), ("rg1", 2003), ("rg2", 1700))
      .toDF("release_group_mbid", "first_release_date_year"),
    releaseYears = Seq(("rel0", 1991), ("rel1", 2003), ("rel2", 2010),
      ("rel3", 1988)).toDF("release_mbid", "first_release_date_year"),
    recordingLengths = Seq(("r0", 240000L), ("r1", 180000L), ("r2", 200000L))
      .toDF("recording_mbid", "length"),
    artistCountries = Seq(("am0", "IS"), ("am1", "GB"))
      .toDF("artist_mbid", "country_code"),
    recordingArtists = Seq(("r0", Seq("am0")), ("r1", Seq("am1")),
      ("r2", Seq("am0")), ("r3", Seq("am1")), ("r4", Seq("am0")),
      ("r5", Seq("am1"))).toDF("recording_mbid", "artist_mbids"),
    recordingGenres = Seq(("r0", "rock", 5L), ("r1", "jazz", 3L))
      .toDF("recording_mbid", "genre", "genre_count"),
    releaseGroupGenres = Seq(("r0", "rock", 2L), ("r2", "pop", 4L))
      .toDF("recording_mbid", "genre", "genre_count"),
    artistGenres = Seq(("r1", "fusion", 1L), ("r3", "pop", 2L))
      .toDF("recording_mbid", "genre", "genre_count"),
    recordingTags = Seq(("r0", "energetic", 7L), ("r1", "calm", 2L))
      .toDF("recording_mbid", "tag", "tag_count"),
    artistTags = Seq(("r0", "live", 3L)).toDF("recording_mbid", "tag", "tag_count"),
    releaseGroupTags = Seq(("r2", "studio", 1L))
      .toDF("recording_mbid", "tag", "tag_count"),
    popularity = Seq(("r0", 100L), ("r1", 50L), ("r2", 10L))
      .toDF("recording_mbid", "total_listen_count"),
    newReleases = Seq(("relN1", "Fresh One", Seq("am0")),
      ("relN2", "Fresh Two", Seq("am1")), ("relN3", "Unrelated", Seq("amX")))
      .toDF("release_mbid", "release_name", "artist_credit_mbids"))

  private lazy val dispatch = new Dispatch(spark, store,
    new IncrementalStatsEngine(spark, tmpDir("dispatch-all-work")),
    caches, workDir = tmpDir("dispatch-all"))

  private def run(name: String, entity: String = "artist_name",
      year: Int = 2024): org.apache.spark.sql.DataFrame =
    dispatch.handle(dispatch.StatRequest(name, entity = entity, year = year))

  test("every registered read-path name dispatches and returns rows") {
    val mutating = Seq("import.dump.full", "import.dump.incremental",
      "import.dump.sample", "import.deleted_listens",
      "import.compact_listens")
    // ordered: cf.create_dataframes precedes train_model precedes
    // recommendations (they share the persisted playcounts/model)
    val readOnly = Dispatch.names.filterNot(mutating.contains)
    val payloadFor: Map[String, org.apache.spark.sql.DataFrame] =
      Map("import.dump.mlhd" -> listensDf(fixture))
    // handlers that aggregate by a listen COLUMN need a real column name;
    // the entity-stats families accept the "artists" alias
    val columnEntity = Set("stats.user.entity", "stats.sitewide.entity",
      "stats.entity.listeners", "popularity.popularity", "popularity.entity",
      "similarity.sessions", "troi.playlists")
    readOnly.foreach { name =>
      val req = dispatch.StatRequest(name,
        entity = if (columnEntity.contains(name)) "artist_name" else "artists",
        year = 2024, data = payloadFor.get(name))
      val out = dispatch.handle(req)
      withClue(s"$name: ") { assert(out.count() > 0) }
    }
  }

  test("popularity.popularity honors the mlhd flag: the chunked engine " +
    "over the imported MLHD store equals direct aggregation") {
    dispatch.handle(dispatch.StatRequest("import.dump.mlhd",
      data = Some(listensDf(fixture))))
    val out = dispatch.handle(dispatch.StatRequest("popularity.popularity",
        entity = "artist_name", mlhd = true))
      .collect()
      .map(r => (r.getAs[String]("artist_name"),
        r.getAs[Long]("total_listen_count"),
        r.getAs[Long]("total_user_count"))).toSet
    val direct = graft.popularity.Popularity.entity(
        listensDf(fixture), "user_id", Seq("artist_name"))
      .collect()
      .map(r => (r.getAs[String]("artist_name"),
        r.getAs[Long]("total_listen_count"),
        r.getAs[Long]("total_user_count"))).toSet
    assert(out.nonEmpty)
    assert(out == direct,
      "per-user-prefix chunked partials must combine to the exact counts")
  }

  test("mlhd chunk predicates reach the scan as PARTITION filters " +
    "(each chunk job reads one directory, not the whole store)") {
    val wd = tmpDir("mlhd-prune")
    val d2 = new Dispatch(spark, store,
      new IncrementalStatsEngine(spark, tmpDir("mlhd-prune-work")),
      caches, workDir = wd)
    d2.handle(d2.StatRequest("import.dump.mlhd",
      data = Some(listensDf(fixture))))
    val mlhd = spark.read.parquet(s"$wd/mlhd")
    // the dispatch's predicate shape: cast survives partition pruning
    val pruned = mlhd.filter(col("chunk").cast("string") === "1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:"), scan)
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*chunk[^\\]]*\\].*"),
      s"chunk predicate must appear as a partition filter:\n$scan")
    // and it selects exactly the user-1..3 fixture slice it should
    val direct = listensDf(fixture)
      .filter(col("user_id").cast("string").startsWith("1")).count()
    assert(pruned.count() === direct)
  }

  test("import commands mutate the store end-to-end") {
    // force the fixture store to exist before mutating it
    val baseCount = store.baseListens.count()
    assert(baseCount == fixture.size)
    val incDump = listensDf(Seq(
      l(1, "Artist0", "2024-12-30 10:00:00", "r9", "rel9", "am0")))
    assert(dispatch.handle(dispatch.StatRequest("import.dump.incremental",
      data = Some(incDump), dumpId = 7)).count() == 1)
    assert(store.incrementalListens.count() == 1)
    assert(dispatch.handle(dispatch.StatRequest("import.compact_listens"))
      .count() == 1)
    assert(store.incrementalListens.count() == 0)
    assert(store.baseListens.count() == fixture.size + 1)

    val del = store.baseListens.orderBy(col("listened_at")).limit(1)
      .select(Listen.deletionKey.map(col): _*).localCheckpoint()
    assert(dispatch.handle(dispatch.StatRequest("import.deleted_listens",
      data = Some(del))).count() == 1)
    assert(store.listens(ts("2000-01-01 00:00:00"),
      ts("2030-01-01 00:00:00")).count() == fixture.size)

    assert(dispatch.handle(dispatch.StatRequest("import.dump.full",
      data = Some(listensDf(fixture)), dumpId = 8)).count() == 1)
    assert(store.baseListens.count() == fixture.size)
    assert(store.incrementalListens.count() == 0,
      "full import discards the incremental sibling")
  }

  test("YIM top_stats serves the artist-map rollup variant") {
    val out = run("year_in_music.top_stats", entity = "artist_map")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty && out.keys.map(_._2).toSet.subsetOf(Set("IS", "GB")))
  }

  test("YIM handlers honor the year window") {
    val lc2024 = run("year_in_music.listen_count", year = 2024)
      .select(map_values(col("yearly_listen_counts"))).as[Seq[Long]]
      .collect().head.sum
    val lc2023 = run("year_in_music.listen_count", year = 2023)
      .select(map_values(col("yearly_listen_counts"))).as[Seq[Long]]
      .collect().head.sum
    assert(lc2024 == fixture.count(_.listened_at.toLocalDateTime.getYear == 2024))
    assert(lc2023 == fixture.count(_.listened_at.toLocalDateTime.getYear == 2023))
  }

  test("tags.default unions the three sources with percentile ranking") {
    val out = run("tags.default").collect()
    assert(out.map(_.getAs[String]("source")).toSet ==
      Set("recording", "artist", "release-group"))
    val recording = run("tags.default")
      .filter(col("source") === "recording")
      .select(explode(col("tags"))).select("col.tag", "col.percent")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // single-ranked tags get percentile 1 (the COALESCE branch)
    assert(recording("energetic") == 1.0 && recording("calm") == 1.0)
  }

  test("releases.fresh honors days window, threshold, and future flag") {
    // dated release list: one past, one future, one outside the window
    val dated = Seq(
      ("relP", "Past", Seq("am0"), "2024-11-01 00:00:00"),
      ("relF", "Future", Seq("am0"), "2025-02-01 00:00:00"),
      ("relOld", "Ancient", Seq("am0"), "2020-01-01 00:00:00"))
      .toDF("release_mbid", "release_name", "artist_credit_mbids", "d")
      .withColumn("release_date", col("d").cast("timestamp")).drop("d")
    val d2 = new Dispatch(spark, store,
      new IncrementalStatsEngine(spark, tmpDir("fresh-work")),
      caches.copy(newReleases = dated), workDir = tmpDir("fresh-wd"))
    // anchor = max listened_at in the fixture (2024-12-xx); 90 days spans
    // both relP and relF but not relOld
    val out = d2.handle(d2.StatRequest("releases.fresh",
        days = 90, threshold = 1L))
      .select(col("user_id"), explode(col("releases")).as("r"))
      .select(col("r.release_mbid"), col("r.is_future")).distinct()
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("relP" -> false, "relF" -> true),
      "window keeps past+future releases, drops the out-of-window one")

    // a threshold above every user's am0 listen count empties the result
    val none = d2.handle(d2.StatRequest("releases.fresh",
      days = 90, threshold = 1000L))
    assert(none.count() == 0)
  }

  test("new releases of top artists equi-join matches only credited artists") {
    val out = run("year_in_music.new_releases_of_top_artists")
      .select("release_mbid").as[String].collect().toSet
    assert(out == Set("relN1", "relN2"), "the amX-only release must not match")
  }
}
