package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.DedupOps._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup: count lineitem") {
      graft.io.Tables.load(spark, sfDir, "lineitem").count()
    }
    // inline decomposition of minhashLsh
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", graft.ext.TextOps.normText(col("text")))
    val d = shingleSets(docs).persist()
    t("sets") { println("  " + d.count()) }
    val sigs = signaturesFromTable(shingleTable(d))
    val banded = sigs.select(col("doc_id"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        (0 until rowsPerBand).foldLeft(col("band").cast("long")) { (acc, j) =>
          (acc * 1000003L + element_at(col("sig"),
            col("band") * lit(rowsPerBand) + lit(j + 1))) % 2147483647L
        }.as("bucket")).persist()
    t("banded") { println("  " + banded.count()) }
    val keptBuckets = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= maxBucketSize)
      .select("band", "bucket")
    val kept = banded.join(keptBuckets, Seq("band", "bucket"))
    val candidates = kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    t("candidates") { println("  " + candidates.count()) }
    val withSets = candidates
      .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    t("verify+jaccard") {
      println("  " + withSets
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b"))) > 0.2).count())
    }
    spark.stop()
  }
}
