package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sinks
import graft.ops.{DuplicateKeyException, Normalize, Quality}

class IngestionSpec extends SparkSpec {
  import spark.implicits._

  test("full ingestion pipelines produce the entity + DAY_DT read-back") {
    val sup = Ingestion.suppliers(spark, sfDir)
    assert(sup.columns.toSeq == Seq("SUPPLIER_ID", "SUPPLIER_NAME",
      "CONTACT_DETAILS", "REGION", "DAY_DT"))
    assert(sup.count() == 10)
    assert(sup.select("DAY_DT").distinct().as[String].head() == "2024-06-01")
    // OAuth-secured path
    assert(Ingestion.customers(spark, sfDir).count() == 150)
  }

  test("dup gate aborts an ingestion BEFORE anything is written") {
    val legacy = Files.createTempDirectory("gate").toString + "/legacy"
    val dup = Seq((1L, "a"), (1L, "b")).toDF("ID", "V")
      .withColumn("DAY_DT", to_date(lit("2024-06-01")))
    assertThrows[DuplicateKeyException] {
      Quality.requireUnique(dup, Seq("ID")) // the gate, as pipelines call it
      Sinks.doubleWrite(dup, legacy + "_raw", legacy)
    }
    assert(!new java.io.File(legacy).exists(),
      "legacy written despite failing gate")
  }

  test("ingestion conformance survives messy raw names end-to-end") {
    val raw = Seq((7L, "x")).toDF(" Supplier Id ", "supplier name")
    val conformed = Normalize.selectCols(
      Normalize.normalizeColumnNames(raw),
      Seq("SUPPLIER_ID", "SUPPLIER_NAME"))
    assert(conformed.columns.toSeq == Seq("SUPPLIER_ID", "SUPPLIER_NAME"))
    assert(conformed.as[(Long, String)].head() == ((7L, "x")))
  }
}
