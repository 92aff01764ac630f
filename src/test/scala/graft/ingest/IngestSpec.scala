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
}
