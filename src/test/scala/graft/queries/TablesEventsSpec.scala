package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import graft.core.Tables

/** `Tables.events` must load BOTH physical encodings the driver has
  * shipped for events.ts — TIMESTAMP(NANOS) and plain timestamp[us] —
  * into identical session-TZ timestamps, and must NOT leak the nanos
  * legacy flag into the session conf (round-6 verdict item: the flag was
  * set globally on every read).
  */
class TablesEventsSpec extends SparkSpec {

  private val flagKey = "spark.sql.legacy.parquet.nanosAsLong"

  private def stage(fixture: String): String = {
    val dir = tmpDir("events-enc")
    Files.copy(
      Paths.get(s"src/test/resources/$fixture"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("nanos and micros encodings load to identical timestamps") {
    val nanos = Tables.events(spark, stage("events_nanos.parquet"))
    val micros = Tables.events(spark, stage("events_us.parquet"))
    assert(nanos.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(micros.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val a = nanos.orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = micros.orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("the nanos legacy flag does not leak into the session conf") {
    val before = spark.conf.getOption(flagKey)
    val df = Tables.events(spark, stage("events_nanos.parquet"))
    assert(spark.conf.getOption(flagKey) === before,
      "conf must be restored immediately after the scoped load")
    // lazy execution after restore still reads the nanos file correctly
    assert(df.count() === 5)
    assert(spark.conf.getOption(flagKey) === before)
  }

  test("driver testdata events load through the same branch") {
    val df = Tables.events(spark, sf(""))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(df.limit(1).count() === 1)
  }
}
