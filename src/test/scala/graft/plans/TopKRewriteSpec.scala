package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.retail.Retail

/** The injected optimizer rule: row_number-filter → TopKPerKey.
  * The SparkSpec session activates GraftExtensions, so the rule is live
  * here exactly as in Verify/Bench.
  */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def sales =
    Retail.sales(spark, sfDir).select("CUSTOMER_ID", "SALE_ID", "QUANTITY")

  private def topkNodes(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case t: TopKPerKey => t }.size

  private def withRule[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.topkRewrite.enabled", on.toString)
    try body
    finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  private val wTop = Window.partitionBy("CUSTOMER_ID")
    .orderBy(col("QUANTITY").desc, col("SALE_ID").asc)

  test("canonical rn <= k pattern rewrites and matches the vanilla result") {
    def query = sales
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
    assert(topkNodes(query) == 1, "rewrite did not fire")
    assert(query.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "window node survived the rewrite")
    // heap drain rank == row_number under this total order, so full rows
    // (including rn) must match exactly
    val rewritten = query.as[(Long, Long, java.math.BigDecimal, Int)]
      .collect().toSet
    val vanilla = withRule(on = false) {
      query.as[(Long, Long, java.math.BigDecimal, Int)].collect().toSet
    }
    assert(rewritten == vanilla)
  }

  test("executed plan is sort-free; kill switch restores the sort") {
    val q = sales.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1).drop("rn")
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p.take(1200))
    assert(!p.contains("Sort "), s"unexpected sort:\n${p.take(1200)}")
    withRule(on = false) {
      val v = sales.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") === 1).drop("rn")
      v.collect()
      assert(!v.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }

  test("residual conjuncts are preserved on top of the rewrite") {
    def query = sales
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5 && col("QUANTITY") > 2)
    assert(topkNodes(query) == 1)
    val rewritten = query.drop("rn")
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    val vanilla = withRule(on = false) {
      query.drop("rn").as[(Long, Long, java.math.BigDecimal)]
        .collect().toSet
    }
    assert(rewritten == vanilla)
    assert(rewritten.forall(_._3.intValue > 2))
  }

  test("rank()/dense_rank(), unfiltered, and unpartitioned shapes are left alone") {
    val ranked = sales.withColumn("rk", rank().over(wTop))
      .filter(col("rk") === 1)
    assert(topkNodes(ranked) == 0, "rank() must keep tie-preserving window")
    val flag = sales.withColumn("rn", row_number().over(wTop))
      .withColumn("top", col("rn") === 1) // no filter above the window
    assert(topkNodes(flag) == 0)
    val global = sales.withColumn("rn", row_number().over(
      Window.orderBy(col("QUANTITY").desc, col("SALE_ID").asc)))
      .filter(col("rn") <= 3)
    assert(topkNodes(global) == 0, "global top-k is not this operator's job")
  }

  test("global rn <= k becomes TakeOrderedAndProject, ranks intact") {
    def query = sales.withColumn("rn", row_number().over(
        Window.orderBy(col("QUANTITY").desc, col("SALE_ID").asc)))
      .filter(col("rn") <= 7)
    assert(topkNodes(query) == 0, "global top-k must not use per-key heaps")
    query.collect()
    val p = query.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"single-partition window sort survived:\n${p.take(1200)}")
    val rewritten = query.as[(Long, Long, java.math.BigDecimal, Int)]
      .collect().toSet
    val vanilla = withRule(on = false) {
      query.as[(Long, Long, java.math.BigDecimal, Int)].collect().toSet
    }
    assert(rewritten == vanilla)
  }

  test("maxK refuses huge-k rewrites (spill regime belongs to the sort)") {
    val q = sales.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5000)
    assert(topkNodes(q) == 0, "k=5000 > maxK=1000 must not rewrite")
  }

  test("the gated q_topk_rewrite query compiles to the heap operator") {
    val q = graft.pipelines.MicroQueries.topkRewrite(spark, sfDir)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p.take(1200))
    assert(!p.contains("Sort ") && !p.contains("WindowExec"),
      s"q_topk_rewrite kept a sort/window:\n${p.take(1200)}")
  }

  test("the supplier mart's rank===1 filter picks up the rewrite") {
    val mart = graft.pipelines.SupplierPerformance(spark, sfDir)
    assert(topkNodes(mart) == 1,
      "F4's row_number filter should compile to TopKPerKey via the rule")
    assert(mart.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size == 1, "the unbounded-aggregate window node must survive")
  }

  test("multi-spec window stacks rewrite only the row_number node") {
    // the SupplierPerformance shape: unbounded aggregates over one spec +
    // a top-1 row_number over an ordered spec, filter on the rank
    val wAgg = Window.partitionBy("CUSTOMER_ID")
    def query = sales
      .withColumn("total_qty", sum("QUANTITY").over(wAgg))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select("CUSTOMER_ID", "SALE_ID", "total_qty")
    assert(topkNodes(query) == 1)
    assert(query.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size == 1, "the aggregate window node must survive")
    val rewritten = query.as[(Long, Long, java.math.BigDecimal)]
      .collect().toSet
    val vanilla = withRule(on = false) {
      query.as[(Long, Long, java.math.BigDecimal)].collect().toSet
    }
    assert(rewritten == vanilla)
  }
}
