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

  test("partial pass degrades to pass-through past the cap, result exact") {
    // one input partition holds 13 distinct keys > cap 12: the map-side
    // pass must degrade (pass the overflow key through unfiltered), NOT
    // throw — input partitions are unclustered, so their key cardinality
    // says nothing about post-exchange state. The final pass sees ≤ a
    // few keys per reduce partition and stays under its cap.
    // range's 4 splits each hold ~325 consecutive ids — every split sees
    // all 13 residues (> cap). NOT repartition(1): SinglePartition
    // trivially satisfies the clustering, so no exchange would separate
    // the partial pass from the final one.
    val df = spark.range(0, 1300).selectExpr("id % 13 AS k", "id AS v")
    val top = TopK.perKey(df, Seq("k"), Seq("v" -> TopK.Desc), k = 2,
      maxKeysPerPartition = 12)
    val expected = (0L until 13L)
      .flatMap(k => Seq((k, 1287 + k), (k, 1274 + k))).toSet
    // AQE would coalesce this tiny shuffle to ONE reduce partition and
    // re-concentrate all 13 keys into the final pass; pin it off so the
    // exchange actually spreads keys below the cap
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assert(top.as[(Long, Long)].collect().toSet == expected)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
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
    assert(plan.contains("TopKPerKeyPartial"),
      s"map-side partial pass missing — the exchange would carry the " +
        s"full input:\n${plan.take(1500)}")
    assert(!plan.contains("Sort "), s"unexpected sort:\n${plan.take(1500)}")
  }
}
