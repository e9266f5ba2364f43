package graft.io

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec

/** The object-store semantics contract [[ObjectStoreFs]] enforces —
  * each test pins one of the behaviors that distinguishes a bucket
  * from a POSIX tree (the behaviors that break naive pipelines when
  * they first meet S3/GCS).
  */
class ObjectStoreFsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fs: FileSystem = {
    // fresh bucket per suite run: leftover objects from a previous JVM
    // would make the rename tests' targets exist (rename then correctly
    // refuses and returns false)
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(); ()
    }
    wipe(new java.io.File("target/objstore/specbucket"))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftobj.impl", "graft.io.ObjectStoreFs")
    hc.set("fs.graftobj.root", "target/objstore")
    FileSystem.get(java.net.URI.create("graftobj://specbucket/"), hc)
  }

  private def put(key: String, body: String): Unit = {
    val out = fs.create(new Path(key), true)
    out.write(body.getBytes(UTF_8))
    out.close()
  }

  private def get(key: String): String = {
    val in = fs.open(new Path(key))
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  test("PUT semantics: an object is invisible until close, whole at close") {
    val p = new Path("/put/visible.txt")
    val out = fs.create(p, true)
    out.write("partial".getBytes(UTF_8))
    out.flush()
    intercept[FileNotFoundException](fs.getFileStatus(p))
    out.write(" then all".getBytes(UTF_8))
    out.close()
    assert(get("/put/visible.txt") == "partial then all")
    assert(fs.getFileStatus(p).getLen == 16)
  }

  test("append is not a thing object stores do") {
    put("/ap/x.txt", "once")
    intercept[UnsupportedOperationException](fs.append(new Path("/ap/x.txt")))
  }

  test("directories are synthetic: prefixes exist only while inhabited") {
    intercept[FileNotFoundException](fs.getFileStatus(new Path("/ghost/sub")))
    put("/ghost/sub/deep/obj.txt", "x")
    assert(fs.getFileStatus(new Path("/ghost/sub")).isDirectory)
    assert(fs.getFileStatus(new Path("/ghost/sub/deep")).isDirectory)
    assert(fs.delete(new Path("/ghost/sub/deep/obj.txt"), false))
    intercept[FileNotFoundException](fs.getFileStatus(new Path("/ghost/sub")))
  }

  test("mkdirs writes a marker object; listing hides it") {
    assert(fs.mkdirs(new Path("/mk/empty")))
    assert(fs.getFileStatus(new Path("/mk/empty")).isDirectory)
    assert(fs.listStatus(new Path("/mk/empty")).isEmpty,
      "the _DIRMARKER must not appear in listings")
  }

  test("rename is copy+delete per object and moves INTO an existing dir") {
    put("/rn/a.txt", "payload")
    assert(fs.rename(new Path("/rn/a.txt"), new Path("/rn/b.txt")))
    intercept[FileNotFoundException](fs.getFileStatus(new Path("/rn/a.txt")))
    assert(get("/rn/b.txt") == "payload")
    // dest exists as a prefix -> Hadoop contract: move the source into it
    put("/rn/dir/seed.txt", "s")
    assert(fs.rename(new Path("/rn/b.txt"), new Path("/rn/dir")))
    assert(get("/rn/dir/b.txt") == "payload")
    // prefix rename carries every object under it, object by object
    put("/rn/tree/x/1.txt", "1")
    put("/rn/tree/y/2.txt", "2")
    assert(fs.rename(new Path("/rn/tree"), new Path("/rn/moved")))
    assert(get("/rn/moved/x/1.txt") == "1")
    assert(get("/rn/moved/y/2.txt") == "2")
    intercept[FileNotFoundException](fs.getFileStatus(new Path("/rn/tree")))
  }

  test("delimiter listing: immediate children only, files and prefixes") {
    put("/ls/k1.txt", "a")
    put("/ls/p/k2.txt", "b")
    put("/ls/p/q/k3.txt", "c")
    val names = fs.listStatus(new Path("/ls")).map(s =>
      (s.getPath.getName, s.isDirectory)).toSeq.sortBy(_._1)
    assert(names == Seq(("k1.txt", false), ("p", true)))
  }

  test("declared-schema CSV reads straight off the bucket (the " +
      "reference's gs:// feed shape)") {
    put("/feeds/20240601/sales.csv",
      "SALE_ID,QTY\n1,10\n2,20\n3,30\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "SALE_ID BIGINT, QTY BIGINT")
    val rows = Sources.csv(spark,
        "graftobj://specbucket/feeds/20240601/sales.csv", schema)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("parquet write drives the commit protocol over copy+delete " +
      "rename; read-back is exact; _SUCCESS lands as an object") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    df.write.mode("overwrite")
      .parquet("graftobj://specbucket/commit/out")
    assert(fs.getFileStatus(
      new Path("/commit/out/_SUCCESS")).getLen == 0)
    val back = spark.read.parquet("graftobj://specbucket/commit/out")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // no _temporary litter survives the commit
    intercept[FileNotFoundException](
      fs.getFileStatus(new Path("/commit/out/_temporary")))
  }

  test("DAY_DT dynamic-partition overwrite (the double-write contract) " +
      "holds on the object store: same-day rerun replaces, neighbor " +
      "days untouched, reads prune partitions") {
    val legacy = "graftobj://specbucket/legacy/sales"
    val raw = "graftobj://specbucket/raw/sales_pre"
    def feed(day: String, v: Long) =
      Seq((1L, v, day), (2L, v + 1, day)).toDF("ID", "QTY", "DAY_DT")
    Sinks.doubleWrite(feed("2024-06-01", 10L), raw, legacy)
    Sinks.doubleWrite(feed("2024-06-02", 20L), raw, legacy)
    def day(d: String): Seq[(Long, Long)] =
      Sinks.readLegacyDay(spark, legacy, d)
        .select($"ID", $"QTY").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(day("2024-06-01") == Seq((1L, 10L), (2L, 11L)))
    assert(day("2024-06-02") == Seq((1L, 20L), (2L, 21L)))
    // same-day rerun with changed rows: REPLACE, not append — the
    // dynamic-overwrite staging + copy+delete rename must not
    // duplicate or orphan objects
    Sinks.doubleWrite(feed("2024-06-02", 40L), raw, legacy)
    assert(day("2024-06-02") == Seq((1L, 40L), (2L, 41L)),
      "same-day rerun must replace the partition")
    assert(day("2024-06-01") == Seq((1L, 10L), (2L, 11L)),
      "neighbor day modified by the rerun")
    // the one-day read must partition-prune on the bucket listing
    val plan = Sinks.readLegacyDay(spark, legacy, "2024-06-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("DAY_DT"), plan.take(1500))
  }
}
