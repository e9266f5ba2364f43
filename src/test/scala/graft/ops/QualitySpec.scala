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
}
