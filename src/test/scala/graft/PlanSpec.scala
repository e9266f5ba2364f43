package graft

import graft.pipelines.{CustomerSalesReport, MicroQueries, ProductPerformance,
  SupplierPerformance}

/** Physical-plan audits: the 100 TB properties the pipelines claim must be
  * visible in `explain` — a broadcast that silently degrades to sort-merge
  * or a projection that drags every column through the scan is a plan bug
  * even while results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("product performance: aggregate is the broadcast build side") {
    val p = plan(ProductPerformance(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the fact is pre-aggregated before any join with the dimension: the
    // HashAggregate must appear below the broadcast exchange
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortMergeJoin"),
      "dimension join fell back to sort-merge:\n" + p.take(2000))
  }

  test("supplier performance: no sort-merge join, single aggregate pass") {
    val p = plan(SupplierPerformance(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("customer sales report: no fact-sized global window") {
    val df = CustomerSalesReport(spark, sfDir)
    val p = plan(df)
    // the only unpartitioned window sort is over the tiny value histogram —
    // the full-row plan would show Window above a SinglePartition exchange
    // of the joined fact; assert the tier join is a broadcast instead
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    // TOP_PERFORMER window stays partitioned by customer
    assert(p.contains("row_number"))
  }

  test("scan projection prunes columns and pushes filters") {
    val p = plan(MicroQueries.scanProject(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,45.0)]"), p.take(2000))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity") &&
      !readSchema.contains("l_partkey"),
      s"scan not pruned to 2 columns: $readSchema")
  }

  test("whole-stage codegen covers the mart pipelines' hot path") {
    val df = ProductPerformance(spark, sfDir)
    df.collect() // executes THIS QueryExecution so AQE finalizes in place
    val p = plan(df)
    // codegen'd operators carry the "*(stageId)" prefix in the plan string
    assert(p.contains("*("), p.take(1000))
  }
}
