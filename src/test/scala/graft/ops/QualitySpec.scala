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

  test("skewReport ranks heavy keys with exact share and ratio-to-mean") {
    import spark.implicits._
    // counts: a=4, b=2, c=1, d=1 → total=8, n_keys=4, mean=2
    val d = Seq("a", "a", "a", "a", "b", "b", "c", "d").toDF("k")
    val r = Quality.skewReport(d, "k", 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r == Seq(("a", 4L, 0.5, 2.0), ("b", 2L, 0.25, 1.0)))
  }

  test("skewReport breaks count ties on the key and respects k") {
    import spark.implicits._
    val d = Seq("z", "y", "y", "x").toDF("k")
    val keys = Quality.skewReport(d, "k", 3)
      .as[(String, Long, Double, Double)].collect().toSeq.map(_._1)
    assert(keys == Seq("y", "x", "z"))
  }

  test("skewReport top-k plans as a bounded TakeOrdered, not a global sort") {
    val li = graft.io.Tables.load(spark, sfDir, "lineitem")
    val plan = Quality.skewReport(li, "l_suppkey", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected bounded top-k in plan:\n$plan")
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

  // ---- expectations (declarative rule suite) --------------------------

  private val expSchema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("amt", DoubleType, nullable = true)))

  private def expFixture = df(Seq(
    Row(1L, "O", 10.0),
    Row(2L, "F", 150.0),    // violates in_range [0,100]
    Row(3L, "X", 20.0),     // violates in_set {O,F}
    Row(null, "O", null),   // violates not_null(id) AND in_range (NULL)
    Row(5L, "F", 30.0),
    Row(5L, "O", 40.0)      // id=5 duplicated → unique violation (2 rows)
  ), expSchema)

  private def report(rules: Seq[Quality.Rule]): Map[String, (Long, Long, Boolean)] =
    Quality.expectations(expFixture, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("expectations counts violations per rule, NULL counts as violation") {
    val rep = report(Seq(
      Quality.Rule.NotNull("id"),
      Quality.Rule.InRange("amt", 0.0, 100.0),
      Quality.Rule.InSet("status", Seq("O", "F")),
      Quality.Rule.MatchesRegex("status", "^[A-Z]$"),
      Quality.Rule.Unique(Seq("id"))))
    assert(rep("not_null(id)") == ((6L, 1L, false)))
    // 150.0 out of range + NULL amt → 2 violations
    assert(rep("in_range(amt)") == ((6L, 2L, false)))
    assert(rep("in_set(status)") == ((6L, 1L, false)))
    assert(rep("matches_regex(status)") == ((6L, 0L, true)))
    // id=5 occurs twice → both rows in the over-occupied group count
    assert(rep("unique(id)") == ((6L, 2L, false)))
  }

  test("expectations on a clean column passes") {
    val rep = report(Seq(Quality.Rule.NotNull("status"),
      Quality.Rule.Unique(Seq("id", "status"))))
    assert(rep("not_null(status)") == ((6L, 0L, true)))
    assert(rep("unique(id,status)") == ((6L, 0L, true)))
  }

  test("expectations value rules share ONE aggregation over one scan") {
    val plan = Quality.expectations(expFixture, Seq(
      Quality.Rule.NotNull("id"),
      Quality.Rule.InRange("amt", 0.0, 100.0),
      Quality.Rule.InSet("status", Seq("O", "F"))))
      .queryExecution.optimizedPlan.toString()
    // one Aggregate node for all three value rules (no per-rule scan)
    assert(plan.sliding("Aggregate".length).count(_ == "Aggregate") == 1,
      s"expected a single Aggregate, got:\n$plan")
  }

  test("RefIntegrity counts unmatched non-null keys; NULL keys are exempt") {
    import spark.implicits._
    val facts = Seq(
      (Some(1L), "a"), (Some(2L), "b"),      // both match
      (Some(9L), "c"),                        // no match -> violation
      (None: Option[Long], "d"))              // NULL key -> exempt
      .toDF("fk", "v")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val rule = Quality.Rule.RefIntegrity(Seq("fk"), "dim", Seq("pk"))
    val got = Quality.expectations(facts, Seq(rule),
      refs = Map("dim" -> dim))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("ref(fk->dim)", 4L, 1L, false)))
    // an unresolvable reference fails loudly at build, not silently
    val e = intercept[IllegalArgumentException] {
      Quality.expectations(facts, Seq(rule))
    }
    assert(e.getMessage.contains("dim"))
    // mismatched arity is rejected at rule construction
    intercept[IllegalArgumentException] {
      Quality.Rule.RefIntegrity(Seq("a", "b"), "dim", Seq("pk"))
    }
  }

}
