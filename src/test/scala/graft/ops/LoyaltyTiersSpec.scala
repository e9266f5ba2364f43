package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.retail.Retail

class LoyaltyTiersSpec extends SparkSpec {

  test("histogram-threshold tiering equals exact global percent_rank") {
    val amounts = Retail.sales(spark, sfDir)
      .select(col("SALE_ID"),
        (col("QUANTITY") * lit(3)).cast("decimal(12,2)").as("AMT"))
    val viaWindow = amounts
      .withColumn("pr", percent_rank().over(Window.orderBy(col("AMT").desc)))
      .withColumn("expected",
        when(col("pr") <= 0.2, "Gold")
          .when(col("pr") <= 0.5, "Silver").otherwise("Bronze"))
      .select("SALE_ID", "AMT", "expected")
    val viaHistogram = LoyaltyTiers.tierByAmount(amounts, "AMT", "actual")
    val joined = viaWindow.join(viaHistogram, Seq("SALE_ID", "AMT"))
    val mismatches = joined.filter(col("expected") =!= col("actual")).count()
    assert(mismatches == 0, s"$mismatches tier mismatches")
    // SALE_ID is not unique in the synthetic fixture, so the check join can
    // fan out — count the tiered frame itself, not the join.
    assert(viaHistogram.count() == amounts.count())
  }

  test("adaptive: both cumsum branches produce identical tiers") {
    val amounts = Retail.sales(spark, sfDir)
      .select(col("SALE_ID"),
        (col("QUANTITY") * lit(3)).cast("decimal(12,2)").as("AMT"))
    // force the two-level branch (threshold 0) and the small branch
    // (threshold Long.Max) on the same input
    val twoLevel = LoyaltyTiers
      .tierByAmount(amounts, "AMT", "T", smallHistThreshold = 0L)
      .groupBy("T").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val small = LoyaltyTiers
      .tierByAmount(amounts, "AMT", "T", smallHistThreshold = Long.MaxValue)
      .groupBy("T").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoLevel == small, s"two-level=$twoLevel small=$small")
  }

  test("pruned histSource with the same multiset yields identical tiers") {
    val amounts = Retail.sales(spark, sfDir)
      .select(col("SALE_ID"), col("QUANTITY"),
        (col("QUANTITY") * lit(3)).cast("decimal(12,2)").as("AMT"))
    // a cheaper twin producing the same AMT multiset (fewer columns)
    val pruned = Retail.sales(spark, sfDir)
      .select((col("QUANTITY") * lit(3)).cast("decimal(12,2)").as("AMT"))
    val direct = LoyaltyTiers.tierByAmount(amounts, "AMT", "T")
      .groupBy("T").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSource = LoyaltyTiers.tierByAmount(amounts, "AMT", "T",
        histSource = pruned)
      .groupBy("T").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == viaSource)
  }

  test("histogram cumsum is two-level: every window is partition-keyed") {
    val amounts = Retail.sales(spark, sfDir)
      .select(col("SALE_ID"), col("QUANTITY").as("AMT"))
    val p = LoyaltyTiers
      .tierByAmount(amounts, "AMT", "T", smallHistThreshold = 0L)
      .queryExecution.executedPlan.toString
    // the value-ordered cumulative sum must run partitioned (pid in its
    // window spec); the only permitted unpartitioned window is the offset
    // pass over one row per partition, which also keys on pid
    val unkeyed = p.linesIterator
      .filter(l => l.contains("windowspecdefinition(") && !l.contains("pid#"))
      .toSeq
    assert(unkeyed.isEmpty,
      "window not two-level:\n" + unkeyed.mkString("\n"))
  }

  test("single-row frame gets Gold (percent_rank 0 edge)") {
    import spark.implicits._
    val one = Seq((1L, java.math.BigDecimal.valueOf(5.0))).toDF("ID", "AMT")
    val r = LoyaltyTiers.tierByAmount(one, "AMT", "T").collect()
    assert(r.head.getAs[String]("T") == "Gold")
  }
}
