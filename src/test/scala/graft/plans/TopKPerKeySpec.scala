package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.retail.Retail

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("native top-k equals window row_number <= k under a total order") {
    val sales = Retail.sales(spark, sfDir)
      .select("CUSTOMER_ID", "SALE_ID", "QUANTITY")
    // pin the reference side to the vanilla sort-based plan — with the
    // TopKRewriteRule active (SparkSpec session) both sides would
    // otherwise compile to the same operator and prove nothing
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    val viaWindow =
      try sales
        .withColumn("rn", row_number().over(Window.partitionBy("CUSTOMER_ID")
          .orderBy(col("QUANTITY").desc, col("SALE_ID").asc)))
        .filter(col("rn") <= 3).drop("rn")
        .as[(Long, Long, java.math.BigDecimal)].collect().toSet
      finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    val viaNative = TopK.perKey(sales,
        Seq("CUSTOMER_ID"),
        Seq("QUANTITY" -> TopK.Desc, "SALE_ID" -> TopK.Asc), k = 3)
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    assert(viaNative == viaWindow)
  }

  test("k larger than every group returns all rows") {
    val sales = Retail.sales(spark, sfDir).select("CUSTOMER_ID", "SALE_ID")
    val all = TopK.perKey(sales, Seq("CUSTOMER_ID"),
      Seq("SALE_ID" -> TopK.Asc), k = 1000000)
    assert(all.count() == sales.count())
  }

  test("key-cardinality cap fails loudly instead of accumulating state") {
    val sales = Retail.sales(spark, sfDir).select("CUSTOMER_ID", "SALE_ID")
    val capped = TopK.perKey(sales, Seq("SALE_ID"), // near-unique key
      Seq("CUSTOMER_ID" -> TopK.Asc), k = 1, maxKeysPerPartition = 10)
    val e = intercept[org.apache.spark.SparkException] { capped.count() }
    assert(e.getMessage.contains("distinct keys") ||
      e.getCause.getMessage.contains("distinct keys"))
  }

  test("plan contains the custom exec and a key exchange, no sort") {
    val sales = Retail.sales(spark, sfDir)
      .select("CUSTOMER_ID", "SALE_ID", "QUANTITY")
    val df = TopK.perKey(sales, Seq("CUSTOMER_ID"),
      Seq("QUANTITY" -> TopK.Desc, "SALE_ID" -> TopK.Asc), k = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(1500))
    assert(!plan.contains("Sort "), s"unexpected sort:\n${plan.take(1500)}")
  }
}
