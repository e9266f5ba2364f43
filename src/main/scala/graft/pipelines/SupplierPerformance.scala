package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Quality
import graft.retail.Retail

/** Supplier performance mart (reference supplier_performance_task.py:13–177):
  * filter non-cancelled sales → join products → right-join suppliers (keep
  * all suppliers) → REVENUE per sale row → fan-out into (a) per-supplier
  * {sum revenue, sum qty, countDistinct product} and (b) window top-1
  * product by revenue → join both back onto suppliers → null-repair
  * ('No sales' / zero-fill) → DAY_DT snapshot stamp.
  *
  * Scale notes:
  *  - suppliers is a small dimension → `broadcast()` on every join touching
  *    it, so the only shuffles are the two SUPPLIER_ID exchanges feeding the
  *    aggregate and the window (both key-partitioned, no global sort).
  *  - The reference recomputes the shared sales⨝products frame for both
  *    consumers (no cache — SURVEY §2.13.6). Here both consumers live in ONE
  *    plan; at 100 TB you'd persist the joined frame or restructure (b) as
  *    an aggregate on (supplier, product) before ranking to shrink the
  *    window input. (b) keeps the reference's per-sale-row ranking semantics.
  *  - The window orders by (REVENUE desc, PRODUCT_NAME, PRODUCT_ID): the
  *    reference's PRODUCT_NAME tie-break (supplier_performance_task.py:94)
  *    plus PRODUCT_ID for a total order.
  */
object SupplierPerformance {

  val asOf = "2024-06-01"

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val suppliers = Retail.suppliers(spark, sfDir)
    val products = Retail.products(spark, sfDir)
    val sales = Retail.sales(spark, sfDir)
      .filter(col("ORDER_STATUS") =!= "Cancelled") // F2: NULL status drops too

    // J4: sales ⟕ products; products is small → broadcast.
    val salesProd = sales.join(broadcast(products), Seq("PRODUCT_ID"), "left")
    // J5 (reference: right join keeping all suppliers) expressed idiomatically
    // as suppliers ⟕ salesProd.
    val joined = suppliers
      .join(salesProd, Seq("SUPPLIER_ID"), "left")
      .withColumn("REVENUE",
        (col("QUANTITY") * col("SELLING_PRICE")).cast(DecimalType(25, 4)))

    // (a) A3: per-supplier aggregate (partial agg map-side, then one
    // SUPPLIER_ID exchange).
    val agg = joined.groupBy("SUPPLIER_ID").agg(
      sum("REVENUE").cast(DecimalType(38, 4)).as("TOTAL_REVENUE"),
      sum("QUANTITY").cast(DecimalType(38, 2)).as("TOTAL_QUANTITY_SOLD"),
      countDistinct("PRODUCT_ID").as("UNIQUE_PRODUCTS_SOLD"))

    // (b) W3: top product per supplier by single-sale revenue.
    val w = Window.partitionBy("SUPPLIER_ID")
      .orderBy(col("REVENUE").desc_nulls_last,
        col("PRODUCT_NAME").asc_nulls_last, col("PRODUCT_ID").asc_nulls_last)
    val top = joined
      .select(col("SUPPLIER_ID"), col("PRODUCT_ID"), col("PRODUCT_NAME"),
        col("REVENUE"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1) // F4
      .select(col("SUPPLIER_ID"), col("PRODUCT_NAME").as("TOP_SELLING_PRODUCT"))

    // J6/J7: glue aggregates back onto the supplier dimension.
    val out = suppliers
      .join(agg, Seq("SUPPLIER_ID"), "left")
      .join(top, Seq("SUPPLIER_ID"), "left")

    Quality.nullRepair(out,
        stringFills = Map("TOP_SELLING_PRODUCT" -> "No sales"),
        zeroFills = Seq("TOTAL_REVENUE", "TOTAL_QUANTITY_SOLD",
          "UNIQUE_PRODUCTS_SOLD"))
      .withColumn("DAY_DT", to_date(lit(asOf)))
      .select("SUPPLIER_ID", "SUPPLIER_NAME", "TOTAL_REVENUE",
        "TOTAL_QUANTITY_SOLD", "UNIQUE_PRODUCTS_SOLD", "TOP_SELLING_PRODUCT",
        "DAY_DT")
      .orderBy("SUPPLIER_ID")
  }

  /** DuckDB oracle — same semantics over the raw fixture parquet. */
  val oracle: String =
    s"""WITH ${Retail.sql.entities},
       |fil AS (SELECT * FROM sales WHERE ORDER_STATUS <> 'Cancelled'),
       |sp AS (
       |  SELECT f.*, p.PRODUCT_NAME,
       |         CAST(f.QUANTITY * p.SELLING_PRICE AS DECIMAL(25,4)) AS REVENUE
       |  FROM fil f LEFT JOIN products p USING (PRODUCT_ID)),
       |joined AS (
       |  SELECT s.SUPPLIER_ID, s.SUPPLIER_NAME, sp.PRODUCT_ID,
       |         sp.PRODUCT_NAME, sp.QUANTITY, sp.REVENUE
       |  FROM suppliers s LEFT JOIN sp USING (SUPPLIER_ID)),
       |agg AS (
       |  SELECT SUPPLIER_ID,
       |         CAST(sum(REVENUE) AS DECIMAL(38,4)) AS TOTAL_REVENUE,
       |         CAST(sum(QUANTITY) AS DECIMAL(38,2)) AS TOTAL_QUANTITY_SOLD,
       |         count(DISTINCT PRODUCT_ID) AS UNIQUE_PRODUCTS_SOLD
       |  FROM joined GROUP BY SUPPLIER_ID),
       |ranked AS (
       |  SELECT SUPPLIER_ID, PRODUCT_NAME,
       |         row_number() OVER (PARTITION BY SUPPLIER_ID
       |           ORDER BY REVENUE DESC NULLS LAST,
       |                    PRODUCT_NAME ASC NULLS LAST,
       |                    PRODUCT_ID ASC NULLS LAST) AS rnk
       |  FROM joined),
       |top AS (SELECT SUPPLIER_ID, PRODUCT_NAME AS TOP_SELLING_PRODUCT
       |        FROM ranked WHERE rnk = 1)
       |SELECT s.SUPPLIER_ID, s.SUPPLIER_NAME,
       |       coalesce(a.TOTAL_REVENUE, 0) AS TOTAL_REVENUE,
       |       coalesce(a.TOTAL_QUANTITY_SOLD, 0) AS TOTAL_QUANTITY_SOLD,
       |       coalesce(a.UNIQUE_PRODUCTS_SOLD, 0) AS UNIQUE_PRODUCTS_SOLD,
       |       coalesce(t.TOP_SELLING_PRODUCT, 'No sales') AS TOP_SELLING_PRODUCT,
       |       DATE '$asOf' AS DAY_DT
       |FROM suppliers s
       |LEFT JOIN agg a USING (SUPPLIER_ID)
       |LEFT JOIN top t USING (SUPPLIER_ID)
       |ORDER BY s.SUPPLIER_ID""".stripMargin
}
