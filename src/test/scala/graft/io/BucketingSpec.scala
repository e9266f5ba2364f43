package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join has no exchange and no sort") {
    // force the sort-merge path (at sf0.001 orders would broadcast) so the
    // assertion exercises exactly the 100 TB plan shape
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val li = Bucketing.bucketed(spark, sfDir, "lineitem", "l_orderkey")
      val o = Bucketing.bucketed(spark, sfDir, "orders", "o_orderkey")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange"),
        "bucketed join still shuffles:\n" + p.take(2000))
      assert(!p.linesIterator.exists(_.matches("""\s*[:+]- Sort \[.*""")),
        "bucketed join still sorts:\n" + p.take(2000))
      assert(joined.count() > 0)
    }
  }

  test("bucketed tables hold exactly the source rows") {
    val li = Bucketing.bucketed(spark, sfDir, "lineitem", "l_orderkey")
    val raw = Tables.load(spark, sfDir, "lineitem")
    assert(li.count() == raw.count())
    val mismatch = li.select("l_orderkey", "l_linenumber", "l_quantity")
      .exceptAll(raw.select("l_orderkey", "l_linenumber", "l_quantity"))
      .count()
    assert(mismatch == 0)
  }

  test("re-registration path: dropping catalog metadata re-attaches files") {
    val name = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_lineitem")).collect()
      .head.name
    spark.sql(s"DROP TABLE $name") // files remain (external location)
    val li = Bucketing.bucketed(spark, sfDir, "lineitem", "l_orderkey")
    assert(li.count() > 0)
    // still bucketed: join planning must not insert an exchange
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val o = Bucketing.bucketed(spark, sfDir, "orders", "o_orderkey")
      val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(2000))
    }
  }
}
