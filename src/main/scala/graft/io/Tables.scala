package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table catalog (TESTDATA.md). One parquet file per table under
  * the scale-factor directory. At 100 TB these become partitioned parquet
  * directories (or an equivalent table format); the reader API is the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain parquet scan. Catalyst handles column pruning + predicate
    * pushdown into the scan (verified via explain: PushedFilters/ReadSchema).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
