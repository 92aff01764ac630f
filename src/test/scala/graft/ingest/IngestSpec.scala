package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("csvToParquet: distributed TSV ETL with provenance column") {
    val src = tmpDir("csv-src")
    val dst = tmpDir("csv-dst") + "/out"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/chunk_a.tsv"),
      "u1\t100\trec1\nu2\t200\trec2\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/chunk_b.tsv"),
      "u3\t300\trec3\n")
    val schema = StructType(Seq(
      StructField("user_id", StringType), StructField("listened_at", LongType),
      StructField("recording_mbid", StringType)))
    FileIngest.csvToParquet(spark, src, dst, schema)
    val out = spark.read.parquet(dst)
    assert(out.count() == 3)
    assert(out.filter(col("source_file").contains("chunk_b"))
      .select("user_id").collect().map(_.getString(0)).toSeq == Seq("u3"))
  }

  test("JdbcCache imports through a real in-process JDBC database") {
    // embedded Derby (shipped with Spark) stands in for the reference's
    // postgres source: the whole query is pushed down, Spark sees only
    // the result cursor (postgres/utils.py:8-17)
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE artist_country (" +
        "artist_mbid VARCHAR(36), country_code VARCHAR(2), junk INT)")
      st.execute("INSERT INTO artist_country VALUES " +
        "('am0', 'IS', 1), ('am1', 'GB', 2), ('am2', 'US', 3)")
    } finally conn.close()

    val target = tmpDir("jdbc-cache") + "/artist-country"
    JdbcCache.importCache(spark,
      JdbcCache.JdbcConfig(url, "", ""),
      // pushdown query: projection + filter run in the database
      "SELECT artist_mbid, country_code FROM artist_country " +
        "WHERE country_code <> 'US'",
      target)
    val cached = JdbcCache.readCache(spark, target)
    assert(cached.columns.toSeq == Seq("ARTIST_MBID", "COUNTRY_CODE"))
    assert(cached.collect().map(r => r.getString(0) -> r.getString(1))
      .toMap == Map("am0" -> "IS", "am1" -> "GB"))
  }

  test("dump import orchestration: full + incremental + invalidation") {
    import graft.engine._
    val root = tmpDir("dump-import")
    val store = new ListenStore(spark, s"$root/store")
    val engine = new IncrementalStatsEngine(spark, s"$root/stats")
    val dumps = new DumpImport(spark, store, s"$root/meta", engine.workDir)
    val provider = TopEntityStats("user_id", Seq("artist_name"), top = 10)
    val (from, to) = (ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00"))

    def l(u: Int, a: String, at: String, created: String) =
      listen(u, a, at, created = created, msid = s"m-$u-$at")

    // 1. full import → stat
    val full = Seq(
      l(1, "A", "2024-01-10 10:00:00", "2024-01-11 00:00:00"),
      l(1, "A", "2024-01-12 10:00:00", "2024-01-13 00:00:00"),
      l(2, "B", "2024-01-14 10:00:00", "2024-01-15 00:00:00"))
    dumps.importFull(listensDf(full), dumpId = 1)
    val s1 = engine.run("top", provider, store, from, to).collect()
    assert(s1.map(_.getLong(1)).sum == 3, "all base listens counted")

    // 2. incremental import → merged stat == recompute from scratch
    val inc = Seq(
      l(1, "B", "2024-02-01 10:00:00", "2024-02-02 00:00:00"),
      l(3, "A", "2024-02-03 10:00:00", "2024-02-04 00:00:00"))
    dumps.importIncremental(listensDf(inc), dumpId = 2)
    val merged = engine.run("top", provider, store, from, to)
    val scratch = provider.stats(provider.aggregate(
      listensDf(full ++ inc)))
    assert(merged.collect().map(_.toString).sorted.toSeq ==
      scratch.collect().map(_.toString).sorted.toSeq,
      "cached-partial merge must equal recompute over the union")

    // high-water marks advanced per user
    val hw = dumps.incrementalHighWater.collect()
      .map(r => r.getInt(0) -> r.getTimestamp(1).toString).toMap
    assert(hw == Map(1 -> "2024-02-02 00:00:00.0", 3 -> "2024-02-04 00:00:00.0"))

    // 3. re-import full (compaction upstream): stats cache invalidated,
    //    incremental discarded, ledger idempotent per (dump_id, type)
    dumps.importFull(listensDf(full ++ inc), dumpId = 1)
    assert(store.incrementalListens.count() == 0)
    val s3 = engine.run("top", provider, store, from, to)
    assert(s3.collect().map(_.toString).sorted.toSeq ==
      scratch.collect().map(_.toString).sorted.toSeq)
    val ledger = dumps.importMetadata.collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(ledger.sorted.toSeq == Seq((1, "full"), (2, "incremental")),
      "re-import of dump 1 replaces its ledger row")
  }

  test("sample import ledgers as (dumpId, sample), not replacing full") {
    import graft.engine._
    val root = tmpDir("sample-import")
    val store = new ListenStore(spark, s"$root/store")
    val engine = new IncrementalStatsEngine(spark, s"$root/stats")
    val dumps = new DumpImport(spark, store, s"$root/meta", engine.workDir)
    val df = listensDf(Seq(listen(1, "A", "2024-01-10 10:00:00")))
    dumps.importFull(df, dumpId = 7)
    dumps.importFull(df, dumpId = 7, dumpType = "sample")
    val ledger = dumps.importMetadata.collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(ledger == Seq((7, "full"), (7, "sample")),
      "a sample sharing dump_id 7 keeps the full-import ledger row")
  }

  test("MLHD ETL: per-user TSV tree → hex-prefix-chunked listen parquet") {
    val src = tmpDir("mlhd-src")
    val raw = tmpDir("mlhd-raw") + "/raw"
    val out = tmpDir("mlhd-out") + "/data"
    // the corpus layout: <prefix-dir>/<uuid>.txt, headerless TSV
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$src/a1"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$src/0f"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/a1/a1b2c3d4.txt"),
      "1700000000\tm1,m2\trel1\trec1\n1700000100\tm3\trel2\trec2\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/0f/0fab12cd.txt"),
      "1700000200\tm4\trel3\trec3\n")

    MlhdImport.etl(spark, s"$src/*/*.txt", raw)
    MlhdImport.postProcess(spark, raw, out)

    val result = spark.read.parquet(out)
    assert(result.count() == 3)
    // user ids are STRINGS from the file names; chunks are their leading
    // hex char (mlhd/download.py:24-27), not an integer modulus
    assert(result.select("user_id").distinct().collect()
      .map(_.getString(0)).toSet == Set("a1b2c3d4", "0fab12cd"))
    assert(result.select(col("chunk").cast("string")).distinct().collect()
      .map(_.getString(0)).toSet == Set("a", "0"))
    val row = result.filter(col("recording_mbid") === "rec1").collect()(0)
    assert(row.getAs[java.sql.Timestamp]("listened_at") ==
      new java.sql.Timestamp(1700000000L * 1000))
    assert(row.getSeq[String](row.fieldIndex("artist_credit_mbids")) ==
      Seq("m1", "m2"))
  }

  test("MLHD ETL reads zstd-compressed per-user files (.txt.zst)") {
    // the real corpus ships per-user files zstd-compressed
    // (mlhd/download.py:63-106 decompresses explicitly; here the READ path
    // is identical because Hadoop's codec factory resolves .zst). The
    // fixture is written with zstd-jni, which Spark bundles.
    val src = tmpDir("mlhd-zst-src")
    val raw = tmpDir("mlhd-zst-raw") + "/raw"
    val out = tmpDir("mlhd-zst-out") + "/data"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$src/a1"))
    val zo = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(s"$src/a1/a1b2c3d4.txt.zst"))
    zo.write(("1700000000\tm1,m2\trel1\trec1\n" +
      "1700000100\tm3\trel2\trec2\n").getBytes("UTF-8"))
    zo.close()

    // hadoop's own ZStandardCodec needs a native binding this container
    // lacks — ZstdJniCodec routes .zst through the zstd-jni Spark bundles,
    // so the compressed read path runs for real here
    ZstdJniCodec.install(spark)
    MlhdImport.etl(spark, s"$src/*/*.txt.zst", raw)
    MlhdImport.postProcess(spark, raw, out)
    val result = spark.read.parquet(out)
    assert(result.count() == 2)
    // user id comes from the file base name with BOTH extensions stripped
    assert(result.select("user_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("a1b2c3d4"))
    val row = result.filter(col("recording_mbid") === "rec1").collect()(0)
    assert(row.getSeq[String](row.fieldIndex("artist_credit_mbids")) ==
      Seq("m1", "m2"))
  }

  test("ZstdJniCodec write path: Spark text write through the codec " +
      "round-trips") {
    import spark.implicits._
    ZstdJniCodec.install(spark)
    val dir = tmpDir("zst-write") + "/out"
    val lines = (1 to 50).map(i => s"line-$i")
    // CompressionOutputStream.close() calls finish() after the zstd
    // stream is closed — this write fails unless finish() is idempotent
    lines.toDF("value").coalesce(1).write
      .option("compression", classOf[ZstdJniCodec].getName)
      .text(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".zst"))
    assert(files.nonEmpty, "codec write produced .zst files")
    val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(back.toSeq == lines.sorted, "compressed write round-trips")
  }

  test("globScan reads only matching chunk files") {
    val dir = tmpDir("glob-src")
    import spark.implicits._
    Seq(("a-user", 1)).toDF("user_id", "n")
      .write.parquet(s"$dir/p") // creates part files; rename by chunk instead
    // write two separate single-file datasets under one dir
    val fs = new java.io.File(dir)
    fs.listFiles().foreach(_.delete())
    Seq(("a-user", 1)).toDF("user_id", "n").coalesce(1)
      .write.parquet(s"$dir/chunk=a")
    Seq(("b-user", 2)).toDF("user_id", "n").coalesce(1)
      .write.parquet(s"$dir/chunk=b")
    val onlyA = FileIngest.globScan(spark, s"$dir/chunk=a", "*.parquet")
    assert(onlyA.select("user_id").collect().map(_.getString(0)).toSeq ==
      Seq("a-user"))
  }

  test("chunkPredicates PARTITIONS arbitrary ids — non-hex and null " +
    "leading chars land in the catch-all instead of vanishing") {
    // ids the hex-only predicate set silently excluded: 'user_1' (chunk
    // 'u'), '-3' (chunk '-'), null (chunk null) — plus ordinary hex ones
    import spark.implicits._
    val df = Seq(Some("a1b2"), Some("0fab"), Some("user_1"), Some("-3"),
      Some("Fcaps"), None).toDF("user_id")
    val preds = MlhdImport.chunkPredicates(
      MlhdImport.chunkOf(col("user_id")))
    assert(preds.length == 17)
    // covering with no double-count: per-predicate match counts sum to
    // the row count (each equality matches a distinct constant and the
    // catch-all negates their union, so the set is disjoint by
    // construction — the sum check then proves coverage)
    assert(preds.map(p => df.filter(p).count()).sum == 6L)
    // 'Fcaps' lower-cases into hex chunk f, not the catch-all
    assert(df.filter(preds(15)).collect().map(_.getString(0)).toSeq ==
      Seq("Fcaps"))
    // the catch-all picks up exactly the non-hex and null ids
    assert(df.filter(preds.last).collect()
      .map(r => Option(r.getString(0))).toSet ==
      Set(Some("user_1"), Some("-3"), None))
  }

  test("chunked MLHD aggregation over non-hex ids: a user_1-style id " +
    "runs in exactly one chunk job and the chunked stats equal direct") {
    import spark.implicits._
    val ls = Seq(
      ("a1b2", "X"), ("a1b2", "X"), ("0fab", "Y"),
      ("user_1", "X"), ("user_1", "Z"), ("-3", "Y"), ("Fcaps", "X"))
      .toDF("user_id", "artist_name")
    val preds = MlhdImport.chunkPredicates(
      MlhdImport.chunkOf(col("user_id")))
    // each row matches exactly ONE predicate → exactly one chunk job
    assert(preds.map(p => ls.filter(p).count()).sum == 7L)
    assert(ls.filter(preds.last).select("user_id").distinct()
      .collect().map(_.getString(0)).toSet == Set("user_1", "-3"))
    // and the 17-job chunked aggregate is the direct answer — the
    // silent-undercount regression the catch-all predicate closed
    val provider = graft.engine.TopEntityStats(
      "user_id", Seq("artist_name"), top = 3)
    val chunked = graft.engine.ChunkedRunner.run(
      spark, ls, provider, preds, workDir = tmpDir("mlhd-chunked"))
    val direct = provider.stats(provider.aggregate(ls))
    assert(chunked.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
  }
}
