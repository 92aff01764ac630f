package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Listen

/** Shared test harness: one local session per suite + listen fixtures. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): String = s"/root/testdata/sf0.001"

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Build a listen with fixture-friendly defaults. */
  def listen(
      user: Int, artist: String, at: String,
      mbids: Option[Seq[String]] = None,
      recording: String = "rec",
      msid: String = "msid-1",
      created: String = "2024-02-01 00:00:00"): Listen =
    Listen(
      listened_at = ts(at), created = ts(created), user_id = user,
      recording_msid = msid, artist_name = artist,
      artist_credit_id = Some(1L), release_name = None, release_mbid = None,
      recording_name = recording, recording_mbid = Some("rmbid"),
      artist_credit_mbids = mbids)

  def listensDf(ls: Seq[Listen]): DataFrame = {
    import spark.implicits._
    spark.createDataset(ls).toDF()
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
