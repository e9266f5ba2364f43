package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(rows.asJava, schema)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType, nullable = true)))

  test("duplicates finds multiplicities > 1 only") {
    val d = df(Seq(Row(1L, "a"), Row(1L, "b"), Row(2L, "c")), schema)
    val dups = Quality.duplicates(d, Seq("id")).collect()
    assert(dups.length == 1)
    assert(dups.head.getLong(0) == 1L && dups.head.getLong(1) == 2L)
  }

  test("requireUnique throws DuplicateKeyException on a seeded duplicate") {
    val d = df(Seq(Row(1L, "a"), Row(1L, "b")), schema)
    assertThrows[DuplicateKeyException](Quality.requireUnique(d, Seq("id")))
  }

  test("requireUnique passes a unique key") {
    val d = df(Seq(Row(1L, "a"), Row(2L, "b")), schema)
    Quality.requireUnique(d, Seq("id")) // must not throw
  }

  test("requireUnique treats the composite key as a unit") {
    val s2 = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    val d = df(Seq(Row(1L, 1L), Row(1L, 2L), Row(2L, 1L)), s2)
    Quality.requireUnique(d, Seq("a", "b")) // unique pairwise
    assertThrows[DuplicateKeyException](Quality.requireUnique(d, Seq("a")))
  }

  test("nullRepair fills strings with marker and numerics with zero") {
    val s = StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType, nullable = true),
      StructField("amt", DecimalType(10, 2), nullable = true)))
    val d = df(Seq(
      Row(1L, null, null),
      Row(2L, "x", new java.math.BigDecimal("3.50"))), s)
    val r = Quality.nullRepair(d, Map("name" -> "No sales"), Seq("amt"))
      .orderBy("k").collect()
    assert(r(0).getString(1) == "No sales")
    assert(r(0).getDecimal(2).compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(r(1).getString(1) == "x")
    assert(r(1).getDecimal(2).compareTo(new java.math.BigDecimal("3.50")) == 0)
  }

  test("profile counts rows/nulls/NDV and native min/max per column") {
    import spark.implicits._
    val d = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(2.5)))
      .toDF("k", "s", "x")
    val p = Quality.profile(d)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("k") == ("k", 4L, 0L, 4L, "1", "4"))
    assert(p("s") == ("s", 4L, 1L, 2L, "a", "b"))
    assert(p("x") == ("x", 4L, 1L, 2L, "1.0", "2.5"))
  }

  test("profile scans are pruned to one column each") {
    val li = graft.io.Tables.load(spark, sfDir, "orders")
    val plan = Quality.profile(li).queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    reads.foreach { r =>
      assert(!r.contains(","), s"profile scan reads >1 column: $r")
    }
  }
}
