package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CacheJoinedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def listensFixture = listensDf(Seq(
    listen(1, "A", "2024-01-01 10:00:00", Some(Seq("ma"))),
    listen(1, "A", "2024-01-02 10:00:00", Some(Seq("ma"))),
    listen(1, "B", "2024-01-03 10:00:00", Some(Seq("mb"))),
    listen(2, "C", "2024-01-04 10:00:00", None)))

  test("GenreActivity joins the genre cache, untagged listens drop") {
    // recording_mbid in fixtures is always "rmbid"
    val cache = Seq(("rmbid", "rock"), ("rmbid", "electronic"))
      .toDF("recording_mbid", "genre")
    val p = CacheJoinedStats.GenreActivity(cache, top = 10)
    val out = p.stats(p.combine(p.aggregate(listensFixture))).collect()
    val u1 = out.find(_.getInt(0) == 1).get
      .getSeq[org.apache.spark.sql.Row](1)
    // each of user 1's 3 listens matched both genres
    assert(u1.map(r => r.getString(1) -> r.getLong(0)).toMap ==
      Map("rock" -> 3L, "electronic" -> 3L))
  }

  test("EraActivity keeps unmapped releases under null year") {
    val ls = listensDf(Seq(
      listen(1, "A", "2024-01-01 10:00:00").copy(release_mbid = Some("r90")),
      listen(1, "B", "2024-01-02 10:00:00").copy(release_mbid = Some("r90")),
      listen(1, "C", "2024-01-03 10:00:00").copy(release_mbid = None)))
    val cache = Seq(("r90", 1990)).toDF("release_mbid", "first_release_date_year")
    val p = CacheJoinedStats.EraActivity(cache)
    val byYear = p.stats(p.combine(p.aggregate(ls))).collect()
      .map(r => Option(r.get(1)).map(_.toString) -> r.getLong(2)).toMap
    assert(byYear(Some("1990")) == 2)
    assert(byYear(None) == 1, "unmapped listen retained under null year")
  }

  test("ListeningTime defaults missing track length to 180s") {
    val ls = listensDf(Seq(
      listen(1, "A", "2024-01-01 10:00:00").copy(recording_mbid = Some("known")),
      listen(1, "B", "2024-01-02 10:00:00").copy(recording_mbid = Some("unknown"))))
    val cache = Seq(("known", 240000L)).toDF("recording_mbid", "length")
    val p = CacheJoinedStats.ListeningTime(cache)
    val row = p.stats(p.combine(p.aggregate(ls))).collect().head
    assert(row.getAs[Long]("listening_time_s") == 240 + 180)
    assert(row.getAs[Long]("listen_count") == 2)
  }

  test("MissingMbData surfaces only unmapped listens, ranked per user") {
    val ls = listensDf(Seq(
      listen(1, "A", "2024-01-01 10:00:00").copy(recording_mbid = None,
        recording_name = "unmapped song"),
      listen(1, "A", "2024-01-02 10:00:00").copy(recording_mbid = None,
        recording_name = "unmapped song"),
      listen(1, "B", "2024-01-03 10:00:00"))) // mapped -> excluded
    val out = MissingMbData(ls).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("recording_name") == "unmapped song")
    assert(out.head.getAs[Long]("listen_count") == 2)
    assert(out.head.getAs[Int]("rank") == 1)
  }

  test("ArtistMap rolls up by artist country") {
    val cache = Seq(("ma", "GBR"), ("mb", "ISL")).toDF("artist_mbid", "country_code")
    val p = CacheJoinedStats.ArtistMap(cache)
    val out = p.stats(p.combine(p.aggregate(listensFixture))).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((1, "GBR")) == 2 && out((1, "ISL")) == 1)
    assert(!out.keySet.exists(_._1 == 2), "artist with no country drops")
  }
}
