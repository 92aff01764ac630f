package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Integrity, Survivorship}

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("survivorship: modal vote with tie-break, extremes, all-null field") {
    val records = Seq(
      // cluster 1: modal seg "a" (2 votes) beats "b" (1); nulls ignored
      (1L, Option("a"), 5.0, "zed"),
      (2L, Option("a"), 9.0, "amy"),
      (3L, Option("b"), 1.0, "bob"),
      (4L, None, 7.0, "cat"),
      // cluster 10: 1-1 vote tie -> lexicographic min "x"
      (10L, Option("y"), 2.0, "nn"),
      (11L, Option("x"), 3.0, "mm"),
      // cluster 20: all-null modal field survives as null
      (20L, None, 4.0, "qq")
    ).toDF("id", "seg", "bal", "name")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L)).toDF("id", "component")
    val got = Survivorship.golden(records, "id", clusters,
        modalFields = Seq("seg"), maxFields = Seq("bal"),
        minFields = Seq("name"))
      .select($"component", $"n_members", $"seg", $"bal", $"name")
      .as[(Long, Long, Option[String], Double, String)]
      .collect().sortBy(_._1).toList
    assert(got == List(
      (1L, 4L, Some("a"), 9.0, "amy"),
      (10L, 2L, Some("x"), 3.0, "mm"),
      (20L, 1L, None, 4.0, "qq")))
  }

  test("survivorship: guard rejects an empty rule set") {
    val df = Seq((1L, "a")).toDF("id", "seg")
    val cl = Seq((1L, 1L)).toDF("id", "component")
    intercept[IllegalArgumentException](
      Survivorship.golden(df, "id", cl, Nil, Nil, Nil))
  }

  test("integrity: planted violations are counted exactly") {
    val child = Seq((1L, Option(10L)), (2L, Option(11L)),
      (3L, Option(99L)), (4L, None)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val vals = Seq(("x", Option(1.0)), ("y", Option(5.0)),
      (null.asInstanceOf[String], Option(-2.0)),
      ("x", None)).toDF("c", "v")
    val report = Integrity.report(Seq(
      Integrity.fkOrphans("fk", child, "fk", parent, "pk"),
      Integrity.notNull("nn", vals, "c"),
      Integrity.inRange("rg", vals, "v", 0.0, 2.0),
      Integrity.accepted("ac", vals, "c", Seq("x")),
      Integrity.unique("uq", vals, Seq("c"))))
      .as[(String, Long)].collect().toMap
    // fk: id=3 orphan (null fk doesn't violate); nn: one null c;
    // rg: 5.0 and -2.0 out of range, null v ignored; ac: "y" + null c;
    // uq: 4 rows, 3 distinct c values -> 1 excess
    assert(report == Map("fk" -> 1L, "nn" -> 1L, "rg" -> 2L,
      "ac" -> 2L, "uq" -> 1L))
  }

  test("integrity: clean input reports all zeros, empty input is safe") {
    val clean = Seq((1L, 1.0)).toDF("k", "v")
    val empty = spark.emptyDataset[(Long, Double)].toDF("k", "v")
    val r1 = Integrity.report(Seq(
      Integrity.inRange("rg", clean, "v", 0.0, 2.0),
      Integrity.unique("uq", clean, Seq("k"))))
      .as[(String, Long)].collect().toMap
    assert(r1 == Map("rg" -> 0L, "uq" -> 0L))
    val r2 = Integrity.report(Seq(
      Integrity.notNull("nn", empty, "v"),
      Integrity.inRange("rg", empty, "v", 0.0, 1.0)))
      .as[(String, Long)].collect().toMap
    assert(r2 == Map("nn" -> 0L, "rg" -> 0L))
    intercept[IllegalArgumentException](Integrity.report(Nil))
  }
}
