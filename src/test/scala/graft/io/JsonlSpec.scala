package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ext.TextOps

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def writeFixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl_spec")
    Files.write(dir.resolve("part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("round trip preserves every row and value exactly") {
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.pipelines.JsonlRoundTrip(spark, sfDir)
      .as[(Long, String, String, String, Long)].collect().toSet
    val exp = docs.as[(Long, String, String, String, Long)].collect().toSet
    assert(out == exp)
  }

  test("PERMISSIVE quarantines malformed lines into the capture column") {
    val dir = writeFixture(Seq(
      """{"doc_id": 1, "text": "ok one"}""",
      """{"doc_id": 2 "text": "missing comma"}""",
      """{"doc_id": 3, "text": "ok three"}"""))
    val got = Sources.jsonl(spark, dir, schema,
        mode = "PERMISSIVE", corruptCol = Some("_bad"))
      .select("doc_id", "text", "_bad")
      .as[(Option[Long], Option[String], Option[String])].collect()
    assert(got.length == 3)
    val bad = got.filter(_._3.isDefined)
    assert(bad.length == 1 && bad.head._3.get.contains("missing comma"))
    assert(bad.head._1.isEmpty, "corrupt row must not half-parse")
    assert(got.filter(_._3.isEmpty).map(_._1.get).toSet == Set(1L, 3L))
  }

  test("streaming jsonl ingest splits quarantine and resumes exactly-once") {
    val root = Files.createTempDirectory("jsonl_stream")
    val in = root.resolve("in"); Files.createDirectories(in)
    def paths(n: String) = root.resolve(n).toString
    def start() = graft.streaming.EventStream.jsonlIngest(spark,
      in.toString, schema, paths("good"), paths("bad"),
      paths("ck_good"), paths("ck_bad"))
    Files.write(in.resolve("f1.json"),
      Seq("""{"doc_id": 1, "text": "a"}""",
        """{"doc_id": 2 "text": "broken"}""",
        """{"doc_id": 3, "text": "c"}""").mkString("\n").getBytes("UTF-8"))
    val (g1, q1) = start()
    try { g1.processAllAvailable(); q1.processAllAvailable() }
    finally { g1.stop(); q1.stop() }
    assert(spark.read.parquet(paths("good")).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L))
    val bad1 = spark.read.parquet(paths("bad"))
      .select("_corrupt_line").as[String].collect()
    assert(bad1.length == 1 && bad1.head.contains("broken"))
    // second landing + restart from the same checkpoints: only the new
    // file is processed (no re-emission of f1's rows)
    Files.write(in.resolve("f2.json"),
      Seq("""{"doc_id": 4, "text": "d"}""",
        """not json""").mkString("\n").getBytes("UTF-8"))
    val (g2, q2) = start()
    try { g2.processAllAvailable(); q2.processAllAvailable() }
    finally { g2.stop(); q2.stop() }
    assert(spark.read.parquet(paths("good")).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 4L))
    assert(spark.read.parquet(paths("good")).count() == 3,
      "restart re-emitted already-committed rows")
    assert(spark.read.parquet(paths("bad")).count() == 2)
  }

  test("DROPMALFORMED drops the bad line; FAILFAST refuses the feed") {
    val dir = writeFixture(Seq(
      """{"doc_id": 1, "text": "ok"}""",
      """not json at all"""))
    val dropped = Sources.jsonl(spark, dir, schema, mode = "DROPMALFORMED")
    assert(dropped.count() == 1)
    val strict = Sources.jsonl(spark, dir, schema, mode = "FAILFAST")
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }
}
