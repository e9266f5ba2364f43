package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: `runMain graft.Time <sfDir> <query> [query...]`.
  * Dev tool for isolating bench regressions; BENCH numbers come from Bench.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed fact scans emit per-bucket sort order (Bucketing writes
      // exactly one file per bucket, which makes this safe) so fact-fact
      // merge joins run sort-free as well as shuffle-free
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // the events fixture is TIMESTAMP(NANOS) parquet; its reader
      // requires this mapping and fails loudly if unset (EventOps.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B hook for the optimizer-rule measurements (SURVEY §8.24):
    // SPARK_GRAFT_TOPK_REWRITE=false times the vanilla window plans.
    sys.env.get("SPARK_GRAFT_TOPK_REWRITE").foreach(v =>
      spark.conf.set("spark.graft.topkRewrite.enabled", v))
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

/** A/B for the TopKRewriteRule in the LARGE-GROUP regime the heap
  * operator exists for: top-k sales per ORDER_STATUS (a handful of
  * groups, each a large fraction of the fact table), where the window
  * formulation sorts every group end to end. `runMain graft.TimeTopK
  * <sfDir> [k]` prints warm timings for rewrite on vs off in ONE
  * session (same JIT, same cache state).
  */
object TimeTopK {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sfDir = args.head
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sales = graft.retail.Retail.sales(spark, sfDir)
      .select("ORDER_STATUS", "SALE_ID", "QUANTITY")
    def query = sales
      .withColumn("rn", row_number().over(Window
        .partitionBy("ORDER_STATUS")
        .orderBy(col("QUANTITY").desc, col("SALE_ID").asc)))
      .filter(col("rn") <= k)
    for (pass <- 1 to 3; on <- Seq(true, false)) {
      spark.conf.set("spark.graft.topkRewrite.enabled", on.toString)
      val t0 = System.nanoTime()
      val n = query.count()
      println(f"TOPK_AB pass=$pass rewrite=$on k=$k rows=$n " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

/** Measures the BPE merge-cost CURVE to production vocab sizes —
  * `runMain graft.TimeBpe [maxBudget]` (default 8192) trains
  * from-scratch at doubling budgets on a generated large-vocabulary
  * corpus (the BpeScaleSpec construction scaled up: ~29k distinct
  * words over a 120-syllable base, deterministic zipf-ish
  * frequencies; the learnable-merge ceiling is ~30k, above any
  * budget this tool runs) and prints wall / rounds / ms-per-merge
  * per budget. The claim under test (SURVEY §8): per-merge cost
  * FALLS as the budget grows, because batched rounds amortize — a
  * curve measured only to 1024 before this tool existed.
  */
object TimeBpe {
  def main(args: Array[String]): Unit = {
    val maxBudget = args.headOption.map(_.toInt).getOrElse(8192)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 120 consonant-vowel syllables -> all ordered pairs (14.4k
    // 2-syllable words, one word-level merge each once the 120
    // syllable merges exist) plus a full third-syllable slice (14.4k
    // 3-syllable words, one MORE merge each on top of the pair
    // symbol) -> a ~30k learnable-merge ceiling, so every budget up
    // to 16384 trains to completion instead of running dry.
    // Concatenated without separators so the trainer has multi-round
    // shared structure at many scales.
    val syl = for {
      c <- "bcdfghjklmnpqrstvwxz".toSeq
      v <- "aeiouy".toSeq
    } yield s"$c$v"
    val words =
      (for {
        (a, i) <- syl.zipWithIndex
        (b, j) <- syl.zipWithIndex
      } yield (a + b, ((i * 131 + j * 7) % 97 + 1).toLong)) ++
      (for {
        (a, i) <- syl.zipWithIndex
        (b, j) <- syl.zipWithIndex
      } yield (a + b + syl((i * 7 + j * 13) % 120),
               ((i * 13 + j) % 11 + 1).toLong))
    println(s"BPE_CURVE corpus: ${words.size} distinct words")
    val df = words.toDF("w", "f").repartition(cpus.toInt).persist()
    df.count()
    var budget = 1024
    while (budget <= maxBudget) {
      val t0 = System.nanoTime()
      val merges = graft.ext.BpeOps.trainLoop(spark, df, budget,
        maxRounds = 4000, candWidth = graft.ext.BpeOps.bpeCandidates)
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = merges.map(_._2).distinct.length
      println(f"BPE_CURVE budget=$budget merges=${merges.length} " +
        f"rounds=$rounds sec=$sec%.1f " +
        f"msPerMerge=${sec * 1000 / merges.length}%.2f")
      budget *= 2
    }
    spark.stop()
  }
}
