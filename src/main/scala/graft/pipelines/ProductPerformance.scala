package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Quality
import graft.retail.Retail

/** Product performance mart (reference product_performance_task.py:11–120):
  * non-cancelled sales → products ⟕ sales (keep all products) → grouped
  * {sum qty, sum sales amount, avg price, sum profit} → stock status →
  * null-repair for sale-less products → DAY_DT stamp.
  *
  * Implements the reference's *intent*: the reference as written selects
  * only (PRODUCT_ID, QUANTITY) and then filters ORDER_STATUS — an
  * AnalysisException (SURVEY §2.13.1). Here ORDER_STATUS is kept through
  * the filter, as its sibling task does (supplier_performance_task.py:14–44).
  *
  * Scale notes: grouping key is PRODUCT_ID (+ functionally-dependent dim
  * attributes) → one hash exchange after map-side partial aggregation; the
  * products dim is broadcast. AVG is computed as exact-decimal SUM divided
  * by COUNT in double — one IEEE division, deterministic and
  * order-independent, unlike avg over raw doubles.
  */
object ProductPerformance {

  val asOf = "2024-06-01"

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val products = Retail.products(spark, sfDir)
    val sales = Retail.sales(spark, sfDir)
      .select("PRODUCT_ID", "QUANTITY", "ORDER_STATUS")
      .filter(col("ORDER_STATUS") =!= "Cancelled") // F2 (fixed intent)

    // J3: keep every product, even ones that never sold.
    val joined = broadcast(products).join(sales, Seq("PRODUCT_ID"), "left")

    val agg = joined
      .groupBy("PRODUCT_ID", "PRODUCT_NAME", "CATEGORY", "SELLING_PRICE",
        "COST_PRICE", "STOCK_QUANTITY", "REORDER_LEVEL")
      .agg(
        sum("QUANTITY").cast(DecimalType(38, 2)).as("TOTAL_QUANTITY_SOLD"),
        // A2: expression-valued aggregate sum(qty * price)
        sum(col("QUANTITY") * col("SELLING_PRICE")).cast(DecimalType(38, 4))
          .as("TOTAL_SALES_AMOUNT"),
        sum(col("QUANTITY") * (col("SELLING_PRICE") - col("COST_PRICE")))
          .cast(DecimalType(38, 5)).as("PROFIT"))

    // The reference's avg(SELLING_PRICE) aggregates a per-product constant
    // (price comes from the products side of the left join, so it is present
    // even for sale-less products) — exactly the price itself.
    val out = agg
      .withColumn("AVG_SELLING_PRICE", col("SELLING_PRICE").cast("double"))
      .withColumn("STOCK_STATUS",
        when(col("STOCK_QUANTITY") <= col("REORDER_LEVEL"),
          lit("Below Reorder Level")).otherwise(lit("Sufficient Stock")))
      .withColumn("DAY_DT", to_date(lit(asOf)))

    Quality.nullRepair(out, stringFills = Map.empty,
        zeroFills = Seq("TOTAL_QUANTITY_SOLD", "TOTAL_SALES_AMOUNT", "PROFIT"))
      .select("PRODUCT_ID", "PRODUCT_NAME", "CATEGORY",
        "TOTAL_QUANTITY_SOLD", "TOTAL_SALES_AMOUNT", "AVG_SELLING_PRICE",
        "STOCK_QUANTITY", "REORDER_LEVEL", "STOCK_STATUS", "PROFIT", "DAY_DT")
      .orderBy("PRODUCT_ID")
  }

  val oracle: String =
    s"""WITH ${Retail.sql.entities},
       |fil AS (SELECT PRODUCT_ID, QUANTITY FROM sales
       |        WHERE ORDER_STATUS <> 'Cancelled'),
       |agg AS (
       |  SELECT p.PRODUCT_ID, p.PRODUCT_NAME, p.CATEGORY, p.SELLING_PRICE,
       |         p.COST_PRICE, p.STOCK_QUANTITY, p.REORDER_LEVEL,
       |         CAST(sum(f.QUANTITY) AS DECIMAL(38,2)) AS TOTAL_QUANTITY_SOLD,
       |         CAST(sum(f.QUANTITY * p.SELLING_PRICE) AS DECIMAL(38,4)) AS TOTAL_SALES_AMOUNT,
       |         CAST(sum(f.QUANTITY * (p.SELLING_PRICE - p.COST_PRICE)) AS DECIMAL(38,5)) AS PROFIT
       |  FROM products p LEFT JOIN fil f USING (PRODUCT_ID)
       |  GROUP BY 1,2,3,4,5,6,7)
       |SELECT PRODUCT_ID, PRODUCT_NAME, CATEGORY,
       |       coalesce(TOTAL_QUANTITY_SOLD, 0) AS TOTAL_QUANTITY_SOLD,
       |       coalesce(TOTAL_SALES_AMOUNT, 0) AS TOTAL_SALES_AMOUNT,
       |       CAST(SELLING_PRICE AS DOUBLE) AS AVG_SELLING_PRICE,
       |       STOCK_QUANTITY, REORDER_LEVEL,
       |       CASE WHEN STOCK_QUANTITY <= REORDER_LEVEL
       |            THEN 'Below Reorder Level'
       |            ELSE 'Sufficient Stock' END AS STOCK_STATUS,
       |       coalesce(PROFIT, 0) AS PROFIT,
       |       DATE '$asOf' AS DAY_DT
       |FROM agg ORDER BY PRODUCT_ID""".stripMargin
}
