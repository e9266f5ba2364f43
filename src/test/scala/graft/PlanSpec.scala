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

  test("top-k-shaped queries run on TopKPerKey with no sort anywhere") {
    // cosineTopK / topTokens / tfIdf: the ONLY rank-shaped step is the
    // final per-key top-k — swapping in the heap operator must leave the
    // whole plan sort-free (broadcast/hash joins + hash aggregates only).
    for ((name, df) <- Seq(
        "cosineTopK" -> ext.VectorOps.cosineTopK(spark, sfDir),
        "topTokens" -> ext.TextOps.topTokens(spark, sfDir),
        "tfIdf" -> ext.TextOps.tfIdf(spark, sfDir))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey"), s"$name lost the heap operator")
      assert(!p.contains("Window"), s"$name still ranks via window:\n" +
        p.linesIterator.filter(_.contains("Window")).mkString("\n"))
      assert(!p.contains("Sort ["), s"$name still sorts:\n" +
        p.linesIterator.filter(_.contains("Sort [")).mkString("\n"))
    }
  }

  test("bm25 ranks on the heap; query terms and stats broadcast") {
    // the corpus-sized tf table must meet the tiny term/stat frames via
    // broadcast joins, and both rank steps (term selection, final top-k)
    // must be the heap operator — a window/sort here would globally sort
    // per-lang score streams
    val p = ext.TextOps.bm25(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "bm25 lost the heap operator")
    assert(!p.contains("Window"), "bm25 ranks via window:\n" +
      p.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert(p.contains("BroadcastHashJoin"),
      "bm25's term/stat joins are not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "bm25 shuffles the corpus for a tiny-side join:\n" +
        p.linesIterator.filter(_.contains("SortMergeJoin")).mkString("\n"))
  }

  test("invertedIndex caps the posting head before any list materializes") {
    val p = ext.TextOps.invertedIndex(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"),
      "invertedIndex lost the bounding heap — collect_list is unbounded")
  }

  test("annIvf final rank is the heap operator, not a window over cos") {
    // the two centroid-assignment windows (argmax over 16 rows) remain by
    // design; the FINAL per-probe rank over the searched candidates must
    // not be a window sort
    val p = ext.VectorOps.annIvf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "annIvf lost the heap operator")
    assert(!"windowspecdefinition\\(probe_id#\\d+, cos#".r
        .findFirstIn(p).isDefined,
      "annIvf's final rank is still a window over cos")
  }

  test("dedupApply anti join carries no forced broadcast hint") {
    // the loser set scales with the duplicate count (corpus-sized on a
    // dup-heavy crawl), so the plan must leave the join strategy to the
    // optimizer/AQE: no ResolvedHint in the analyzed plan, and the anti
    // join itself present and executable
    val df = graft.ext.DedupOps.dedupApply(spark, sfDir)
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.contains("ResolvedHint"),
      "dedupApply still forces a join strategy:\n" +
        logical.linesIterator.filter(_.contains("Hint")).mkString("\n"))
    val p = plan(df)
    assert(p.contains("LeftAnti"), "anti join missing:\n" + p.take(1500))
  }

  test("whole-stage codegen covers the mart pipelines' hot path") {
    val df = ProductPerformance(spark, sfDir)
    df.collect() // executes THIS QueryExecution so AQE finalizes in place
    val p = plan(df)
    // codegen'd operators carry the "*(stageId)" prefix in the plan string
    assert(p.contains("*("), p.take(1000))
  }

  test("shuffle-free claims hold: mixture repeat and z-order key") {
    // both are documented as pure scan-side projections — a shuffle
    // appearing here means a regression in the zero-exchange contract
    val mix = graft.ext.SampleOps.mixtureRepeat(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!mix.contains("Exchange"), "mixtureRepeat gained a shuffle:\n" +
      mix.take(800))
    val z = graft.pipelines.MicroQueries.zorderKey(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!z.contains("Exchange"), "zorderKey gained a shuffle:\n" +
      z.take(800))
    // and the z-value filter column set stays pruned to what it reads
    assert(z.contains("ReadSchema"),
      "zorderKey plan lost its scan node?")
  }

  test("editDistance verify stays banded (threshold column in the plan)") {
    // the r5 verdict's one weak plan: an UNTHRESHOLDED levenshtein is
    // quadratic in document length; the bounded form carries the
    // per-row lev_bound argument, visible in the executed plan
    val p = plan(graft.ext.DedupOps.editDistanceNearDup(spark, sfDir))
    // the lev_bound alias may be inlined by CollapseProject; what must
    // survive is a THREE-argument levenshtein call (l, r, threshold) —
    // two top-level commas inside the call (nested parens balanced)
    val call = "levenshtein\\((?:[^()]|\\([^()]*\\))*,(?:[^()]|\\([^()]*\\))*,"
    assert(call.r.findFirstIn(p).isDefined,
      "levenshtein lost its threshold argument:\n" +
        p.linesIterator.filter(_.contains("levenshtein"))
          .mkString("\n").take(1500))
  }

  test("dupSpansApply: keyed plan only — no broadcast of the dup set, no quadratic join") {
    val df = graft.ext.DedupOps.dupSpansApply(spark, sfDir)
    val p = plan(df)
    // the dup-set attach must stay a keyed join/window over gh, never a
    // driver-collected or broadcast structure, and the token-level apply
    // is a left_anti against the position stream
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("LeftAnti"), "token removal lost its anti join:\n" +
      p.take(1500))
    // the gh window carries a partition spec (a global window would
    // single-partition the corpus-sized span stream)
    assert(!p.contains("Window [") ||
      !p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("SinglePartition")),
      "gh stats window lost its partitioning:\n" + p.take(1500))
  }

  test("modelScore runs as typed mapPartitions over a repartitioned input") {
    val p = plan(graft.ext.ScoringOps.modelScore(spark, sfDir))
    assert(p.contains("MapPartitions"),
      "batch seam lost its mapPartitions:\n" + p.take(1500))
    // the single-split fixture must spread before the per-row work
    assert(p.contains("Exchange"),
      "modelScore input no longer repartitions:\n" + p.take(1500))
  }

  test("weightedSample is a pure scan+filter: no exchange anywhere") {
    val p = plan(ext.SampleOps.weightedSample(spark, sfDir))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("hardNegatives: probes broadcast, rank on the TopKPerKey heap, no sort") {
    val p = plan(ext.VectorOps.hardNegatives(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("TopKPerKey"), p.take(2000))
    assert(!p.contains("Window"), "rank fell back to a window:\n" + p.take(2000))
  }

  test("snapshotDiff is ONE key-partitioned full-outer join") {
    val p = plan(pipelines.MicroQueries.snapshotDiff(spark, sfDir))
    assert(p.contains("FullOuter"), p.take(2000))
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(joins == 1, s"expected exactly 1 join, saw $joins:\n" + p.take(2000))
  }

  test("pseudonymize: ONE keyed exchange, partial agg below it, pruned scan") {
    val p = plan(ext.EventOps.pseudonymize(spark, sfDir))
    val xs = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(xs == 1, s"expected 1 exchange, saw $xs:\n" + p.take(2000))
    assert(p.contains("partial_count"), p.take(2000)) // map-side combine
    // the digest rides the FINAL aggregate's result projection — the
    // exchange carries raw user_id groups, not 64-char digests
    assert(!p.contains("Window"), p.take(2000))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("user_id") && readSchema.contains("value") &&
      !readSchema.contains("props"),
      s"scan not pruned: $readSchema")
  }

  test("gopherRules is a pure projection: no exchange, no join, no window") {
    val p = plan(ext.CurationOps.gopherRules(spark, sfDir))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(2000))
  }

  test("perplexityBuckets: vocab and tercile bounds ride broadcast joins") {
    val p = plan(ext.LmOps.perplexityBuckets(spark, sfDir))
    // two explicit broadcasts (voc, bounds); the model join may be
    // broadcast or shuffled per AQE — but never a cartesian product
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected >=2 broadcast joins, saw $bhj:\n" +
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), "bucketing fell back to a window:\n" +
      p.take(2000))
  }

  test("dsirWeights: bucket table broadcasts, one per-doc keyed agg") {
    val p = plan(ext.SampleOps.dsirWeights(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "per-doc agg lost its map-side combine:\n" + p.take(2000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("domainMixture: centroid assignment broadcast + bounded aggs only") {
    val p = plan(ext.VectorOps.domainMixture(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("Window"),
      "modal-source pick fell back to a window:\n" + p.take(2000))
    // the vec→doc join is AQE's choice (hash at this scale); the modal
    // pick must stay an aggregate either way
    assert(p.contains("min_by") || p.contains("max_by"), p.take(2000))
  }

  test("hdrBuckets: map-side combine, pruned scan, no corpus sort") {
    val p = plan(ext.SketchOps.hdrBuckets(
      ext.EventOps.events(spark, sfDir)))
    // the scale claim: the shuffle carries (group, bucket) partials,
    // not raw values — partial_count must sit below the exchange
    assert(p.contains("partial_count"),
      "bucket agg lost its map-side combine:\n" + p.take(2000))
    assert(!p.contains("Sort ") && !p.contains("Window"),
      "sketch build should never sort the corpus:\n" + p.take(2000))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_type") &&
      readSchema.contains("value") && !readSchema.contains("props"),
      s"scan not pruned: $readSchema")
  }

  test("unimaxMix: one corpus pass with map-side combine; waterfill " +
      "windows only the language frame") {
    val p = plan(ext.SampleOps.unimaxMix(spark, sfDir))
    assert(p.contains("partial_sum"),
      "lang token agg lost its map-side combine:\n" + p.take(2000))
    // exactly one exchange carries corpus data (the lang groupBy);
    // everything after runs on the L-row aggregate frame
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("lang") && readSchema.contains("text") &&
      !readSchema.contains("source"),
      s"scan not pruned: $readSchema")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("dppBucketedJoin: DPP in PartitionFilters AND exchange-free " +
      "sort-free fact-fact join on the combined layout") {
    val p = plan(io.Partitioned.dppBucketedJoin(spark, sfDir))
    assert(p.contains("dynamicpruning"),
      "DPP lost — the fact scan reads every partition:\n" + p.take(3000))
    assert(p.contains("PartitionFilters"), p.take(2000))
    // the fact-fact leg: shuffled-hash on matching 32-bucket layouts —
    // no shuffle exchange anywhere (broadcast of the dim is fine), and
    // no sort (the partitioned layout voids the per-bucket sort claim,
    // so a SortMergeJoin here would smuggle sorts back in)
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    // exactly ONE shuffle exchange in the whole plan: the final
    // group-by (post partial-agg, dashboard-sized). The join subtree
    // contributes none.
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 &&
      exchanges.head.contains("o_orderpriority"),
      "bucketed fact-fact join still shuffles:\n" + p.take(3000))
    assert(!p.contains("- Sort ["),
      "combined-layout join sorts:\n" + p.take(3000))
  }

  test("dppJoin: fact scan carries a dynamic partition-pruning filter") {
    val p = plan(io.Partitioned.dppJoin(spark, sfDir))
    assert(p.contains("dynamicpruning"),
      "DPP lost — the fact scan reads every partition:\n" + p.take(3000))
    assert(p.contains("PartitionFilters"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("embedAnisotropy: scalar-column arms, broadcast model, no " +
      "nested-lambda collapse") {
    val p = plan(ext.VectorOps.embedAnisotropy(spark, sfDir))
    assert(p.contains("partial_sum"),
      "cross-row sums lost map-side combine:\n" + p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    // the 64-row model table joins broadcast; corpus never cartesians
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }
}
