package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: distinct 5-grams; short/empty text yields empty set") {
    val r = Seq("abcdefg", "abc", "").toDF("text")
      .select(DedupOps.shingles(col("text")).as("sh"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("abcde", "bcdef", "cdefg"))
    assert(r(1).isEmpty && r(2).isEmpty)
  }

  test("native shingle-hash windows match the composed array form") {
    val df = Seq("abcdefg", "abcd", "", "hello world hello world")
      .toDF("text")
      .withColumn("norm", TextOps.normText(col("text")))
    val native = df.select(
      graft.functions.ShingleHashes(col("norm"), DedupOps.shingleLen)
        .as("sh")).as[Seq[Long]].collect().map(_.toSet).toSeq
    val composed = df.select(
      DedupOps.hashedShinglesOfNorm(col("norm")).as("sh"))
      .as[Seq[Long]].collect().map(_.toSet).toSeq
    assert(native == composed)
  }

  test("minhash signature of identical sets is identical; disjoint differs") {
    val d = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss").toDF("text")
      .select(DedupOps.signature(DedupOps.hashedShingles(col("text"))).as("sig"))
      .as[Seq[Long]].collect()
    assert(d(0) == d(1))
    assert(d(0) != d(2))
  }

  test("aggregate-formulated signatures equal the lambda formulation") {
    val shingled = Seq((1L, "the quick brown fox jumps the fence"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        DedupOps.hashedShingles(col("text")).as("sh"))
    val viaLambda = shingled
      .select(col("doc_id"), DedupOps.signature(col("sh")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = DedupOps.signatures(shingled)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaAgg == viaLambda)
  }

  test("native fused signature equals the aggregate formulation") {
    val shingled = Seq((1L, "the quick brown fox jumps the fence"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        DedupOps.hashedShingles(col("text")).as("sh"))
    val viaNative = shingled
      .select(col("doc_id"),
        graft.functions.MinHashSignature(col("sh")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = DedupOps.signatures(shingled)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaNative == viaAgg)
  }

  test("LSH finds every blocked pair above the verify threshold +0.2 margin") {
    // High-jaccard pairs are near-certain LSH candidates (s-curve ≈ 1 well
    // above the 16-band/4-row crossover); every one must be recovered.
    val strong = DedupOps.jaccardBlocked(spark, sfDir)
      .filter(col("jaccard") >= DedupOps.jaccardThreshold + 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLsh(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(strong.subsetOf(lsh),
      s"LSH missed strong pairs: ${strong.diff(lsh)}")
  }

  test("LSH verify step never emits below-threshold pairs") {
    val bad = DedupOps.minhashLsh(spark, sfDir)
      .filter(col("jaccard") < DedupOps.jaccardThreshold).count()
    assert(bad == 0)
  }

  test("incremental LSH equals the cross-side slice of the full LSH") {
    import graft.functions.{MinHashSignature => MH}
    def isCorpus(id: Long): Boolean =
      ((id % MH.P) * MH.aCoef(0) + MH.bCoef(0)) % MH.P % 1000 <
        DedupOps.incrementalCorpusPermille
    // identical banding + cap ⇒ the asymmetric probe must recover
    // EXACTLY the full self-join's pairs that straddle the side split
    val full = DedupOps.minhashLsh(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val crossSide = full.collect {
      case (a, b, j) if isCorpus(a) != isCorpus(b) =>
        (if (isCorpus(a)) b else a, if (isCorpus(a)) a else b, j)
    }.toSet
    val incr = DedupOps.minhashLshIncremental(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr == crossSide,
      s"missing=${crossSide.diff(incr).take(5)} extra=${incr.diff(crossSide).take(5)}")
  }

  test("native simhash64 expression is bit-identical to the composed fold") {
    val df = Seq("the quick brown fox", "pack my box with five dozen jugs",
      "a", "", "alpha beta gamma delta epsilon zeta")
      .toDF("text").withColumn("toks", split(col("text"), " "))
    val native = df.select(graft.functions.SimHash64(col("toks")).as("sig"))
      .as[Long].collect().toSeq
    val composed = df
      .withColumn("votes", DedupOps.simhashVotes(col("toks")))
      .select(DedupOps.simhashFromVotes(col("votes")).as("sig"))
      .as[Long].collect().toSeq
    assert(native == composed)
  }

  test("simhash chunk-LSH equals all-pairs exactly when the cap is off") {
    // Pigeonhole: Hamming ≤ 8 ⇒ the pair agrees on ≥ 1 of the 9 chunks,
    // so with the mega-bucket cap disabled the banded candidate join must
    // reproduce the all-pairs result EXACTLY — not just approximately.
    val lsh = DedupOps.simhashNearDup(spark, sfDir,
        maxChunkBucket = Int.MaxValue)
      .as[(String, Long, Long, Long)].collect().toSet
    val allPairs = DedupOps.simhashNearDupAllPairs(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(lsh == allPairs,
      s"missing=${allPairs.diff(lsh).take(5)} extra=${lsh.diff(allPairs).take(5)}")
  }

  test("simhash chunk-LSH default cap only drops pairs, never invents them") {
    val capped = DedupOps.simhashNearDup(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    val allPairs = DedupOps.simhashNearDupAllPairs(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(allPairs))
  }

  test("simhash near-dup plan has no salted all-pairs join") {
    // The round-3 scale-killer: candidate generation must go through the
    // (lang, chunk, value) band join, not a salted quadratic self-join.
    val plan = DedupOps.simhashNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("salt"), "salted all-pairs join resurfaced")
    assert(plan.contains("chunk"), "chunk banding missing from plan")
  }

  test("simhash: identical token streams at distance 0, perturbed nearby") {
    val sigs = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota")
      .toDF("text")
      .withColumn("votes", DedupOps.simhashVotes(split(col("text"), " ")))
      .select(DedupOps.simhashFromVotes(col("votes")).as("sig"))
      .as[Long].collect()
    assert(sigs(0) == sigs(1))
    val hamming = java.lang.Long.bitCount(sigs(0) ^ sigs(2))
    assert(hamming > 0 && hamming <= 24, s"one-token edit moved $hamming bits")
  }

  test("dedupApply keeps exactly the non-losers of the LSH clustering") {
    val clusters = DedupOps.dedupClustersLsh(spark, sfDir)
      .as[(Long, Long)].collect()
    val losers = clusters.collect { case (d, c) if d != c => d }.toSet
    val all = TextOps.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val kept = DedupOps.dedupApply(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == all -- losers)
    assert(losers.nonEmpty, "fixture has no near-dup clusters to remove")
    // every cluster still has its representative in the cleaned corpus
    clusters.foreach { case (_, c) => assert(kept.contains(c)) }
  }

  test("dedupApplyBest keeps the max-quality member of every family") {
    val clusters = DedupOps.dedupClustersLsh(spark, sfDir)
      .as[(Long, Long)].collect()
    val scores = TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .as[(Long, Double)].collect().toMap
    // brute-force keep-policy: per family, max score then min doc_id
    val keepers = clusters.groupBy(_._2).map { case (_, members) =>
      members.map(_._1).maxBy(d => (scores(d), -d))
    }.toSet
    val losers = clusters.map(_._1).toSet -- keepers
    val all = TextOps.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val kept = DedupOps.dedupApplyBest(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == all -- losers)
    assert(losers.nonEmpty, "fixture has no near-dup clusters to remove")
    // the policy must actually differ from min-id on this fixture —
    // otherwise the test is vacuous as a policy check
    val minIdKeepers = clusters.map(_._2).toSet
    assert(keepers != minIdKeepers,
      "fixture families all keep their min id — policy untested")
  }

  test("splitLeakage equals the cross-split slice of the LSH pairs") {
    val split = SampleOps.trainValTestSplit(spark, sfDir)
      .as[(Long, String)].collect().toMap
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val exp = pairs.collect {
      case (a, b, j) if split(a) != split(b) =>
        (a, b, split(a), split(b), j)
    }.toSet
    val got = DedupOps.splitLeakage(spark, sfDir)
      .as[(Long, Long, String, String, Double)].collect().toSet
    assert(got == exp)
    assert(pairs.nonEmpty, "fixture produced no LSH pairs")
  }

  test("indexed LSH probe is bit-identical to the in-query incremental") {
    val incr = DedupOps.minhashLshIncremental(spark, sfDir)
      .as[(Long, Long, Double)].collect().sorted
    val indexed = DedupOps.minhashLshIndexed(spark, sfDir)
      .as[(Long, Long, Double)].collect().sorted
    assert(incr.nonEmpty)
    assert(indexed.toSeq == incr.toSeq)
    // second call must REUSE the persisted index (offline-build contract):
    // the _SUCCESS stamps keep their mtimes across a repeat probe
    def stamps(): Seq[Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File("target/lsh_index"))
        .filter(_.getName == "_SUCCESS").map(_.lastModified()).sorted
    }
    val before = stamps()
    assert(before.nonEmpty)
    val again = DedupOps.minhashLshIndexed(spark, sfDir)
      .as[(Long, Long, Double)].collect().sorted
    assert(again.toSeq == incr.toSeq)
    assert(stamps() == before, "index was rebuilt on a repeat probe")
  }

  test("artifact root override relocates the persisted index, same result") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_artifacts").toString
    val baseline = DedupOps.minhashLshIndexed(spark, sfDir)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    System.setProperty("graft.artifact.root", tmp)
    try {
      val overridden = DedupOps.minhashLshIndexed(spark, sfDir)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(overridden == baseline)
      val idx = new java.io.File(s"$tmp/lsh_index")
      assert(idx.isDirectory && idx.listFiles().nonEmpty,
        "index was not built under the overridden root")
      // reuse contract holds at the new location too
      def stamps(): Seq[Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(idx).filter(_.getName == "_SUCCESS")
          .map(_.lastModified()).sorted
      }
      val before = stamps()
      assert(before.nonEmpty)
      DedupOps.minhashLshIndexed(spark, sfDir).collect()
      assert(stamps() == before, "override root index rebuilt on reuse")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("dupSpans matches a driver-side brute-force span count exactly") {
    val w = DedupOps.spanTokens
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normText(col("text")).as("norm"))
      .as[(Long, String)].collect()
    // brute force: every w-token span of every doc, with multiplicity
    val spans = docs.map { case (id, norm) =>
      val toks = norm.split(" ").filter(_.nonEmpty)
      id -> toks.sliding(w).filter(_.length == w).map(_.mkString(" ")).toSeq
    }.toMap
    val docsOf = spans.toSeq
      .flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = spans.map { case (id, ss) =>
      val nDup = ss.count(s => docsOf(s) > 1)
      (id, ss.size.toLong, nDup.toLong)
    }
    val got = DedupOps.dupSpans(spark, sfDir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(got.length == docs.length) // one row per doc, span-less included
    got.foreach { case (id, nSpans, nDup, frac, flagged) =>
      val (_, eSpans, eDup) = expected.find(_._1 == id).get
      assert(nSpans == eSpans, s"doc $id n_spans")
      assert(nDup == eDup, s"doc $id n_dup_spans")
      val eFrac = if (eSpans > 0) eDup.toDouble / eSpans else 0.0
      assert(frac == eFrac, s"doc $id dup_span_frac")
      assert(flagged == (frac > DedupOps.dupSpanFracMax))
    }
    // the fixture exercises real cross-doc duplication, not a trivial zero
    assert(got.exists(_._3 > 0L))
  }

  test("lshRecall: counts consistent, sample non-vacuous, recall is the ratio") {
    val Array((nExact, nLsh, nCommon, recall)) =
      DedupOps.lshRecall(spark, sfDir)
        .as[(Long, Long, Long, Double)].collect()
    assert(nExact > 0, "sample holds no qualifying pair — vacuous fixture")
    assert(nCommon <= math.min(nExact, nLsh))
    assert(recall == nCommon.toDouble / nExact.toDouble)
    assert(recall >= 0.5 && recall <= 1.0,
      s"LSH recall collapsed on the fixture: $recall")
  }

  test("lshRecallGate: healthy banding passes; a sunk parameter set " +
      "fails the chain loudly") {
    // healthy parameters clear the floor — the corpus chain proceeds
    val healthy = DedupOps.lshRecallGate(spark, sfDir)
    assert(healthy >= DedupOps.lshRecallFloor,
      s"healthy banding below its own floor: $healthy")
    // restricting to 1 of 16 bands can only lose pairs, never gain
    val oneBand =
      DedupOps.lshRecallGate(spark, sfDir, floor = 0.0, bandsUsed = 1)
    assert(oneBand <= healthy)
    // failure drill: an over-aggressive mega-bucket cap (1) drops every
    // bucket that could hold a dup pair (a pair needs bucket size >= 2),
    // so guarantee-zone recall collapses to 0 and the gate ABORTS —
    // the loud failure the Runner's corpus chain relies on
    val ex = intercept[IllegalStateException] {
      DedupOps.lshRecallGate(spark, sfDir, bucketCap = 1)
    }
    assert(ex.getMessage.contains("lsh-recall-gate"))
    assert(ex.getMessage.contains("below floor"))
  }

  test("dupSpansApply removes losing spans, keeps first occurrence (brute force)") {
    val w = DedupOps.spanTokens
    // constructed overlap: an 8-token boilerplate block shared by three
    // docs (doc 10 is the corpus-wide keeper), one full clone pair, one
    // doc with an INTERNAL repeat of the shared block, one short doc
    val block = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (10L, s"$block unique ten tail"),
      (20L, s"lead-in twenty $block trailing twenty words"),
      (30L, s"$block $block thirty thirty thirty"), // internal repeat, loser
      (40L, "a fully distinct document with plenty of its own words here"),
      (41L, "a fully distinct document with plenty of its own words here"),
      (50L, "too short"))
    val df = docs.toDF("doc_id", "text")

    // brute force in plain Scala, straight from the scaladoc semantics
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.replaceAll("\\s+", " ")
        .split(" ").filter(_.nonEmpty).toVector
    }.toMap
    val spans = toks.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - w).map(i => (id, i, ts.slice(i, i + w).mkString(" ")))
    }
    val byGram = spans.groupBy(_._3)
    val exp = toks.map { case (id, ts) =>
      val removed = spans.collect {
        case (`id`, i, g)
            if byGram(g).map(_._1).distinct.length > 1 &&
              byGram(g).map(_._1).min != id =>
          (i until i + w)
      }.flatten.toSet
      val keptToks = ts.zipWithIndex.collect {
        case (t, j) if !removed.contains(j) => t
      }
      val frac = if (ts.nonEmpty) removed.size.toDouble / ts.length else 0.0
      (id, ts.length.toLong, removed.size.toLong, frac, keptToks.mkString(" "))
    }.toSet

    val got = DedupOps.dupSpansApplyDocs(df)
      .as[(Long, Long, Long, Double, String)].collect().toSet
    assert(got == exp)
    // fixture really exercises surgery: keeper intact, losers cut
    val gotMap = got.map(r => r._1 -> r).toMap
    assert(gotMap(10L)._3 == 0L, "keeper must lose nothing")
    assert(gotMap(20L)._3 > 0L && gotMap(20L)._5.contains("lead-in twenty"))
    assert(gotMap(30L)._3 > 0L, "internal repeats of a losing gram are cut")
    assert(gotMap(41L)._3 > 0L && gotMap(40L)._3 == 0L,
      "clone pair: smaller id keeps, larger id loses")
    assert(gotMap(50L)._3 == 0L, "short docs have no spans")
  }

  test("editDistanceNearDup matches a driver Levenshtein recompute") {
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val norms = TextOps.documents(spark, sfDir)
      .select(col("doc_id"),
        TextOps.normText(col("text")).as("norm"))
      .as[(Long, String)].collect().toMap
    val got = DedupOps.editDistanceNearDup(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty) // the fixture has near-identical templates
    got.foreach { case (a, b, d, sim) =>
      assert(a < b, s"pair order ($a, $b)")
      val e = lev(norms(a), norms(b))
      assert(d == e.toLong, s"lev($a, $b)")
      val eSim = 1.0 - e.toDouble /
        math.max(norms(a).length, norms(b).length).toDouble
      assert(sim == eSim, s"edit_sim($a, $b)")
      assert(sim >= DedupOps.editSimThreshold)
    }
  }

  test("lshCostCensus ≡ plain-Scala histogram fold; bounds the real candidate count") {
    import org.apache.spark.sql.functions._
    val census = DedupOps.lshCostCensus(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // independent recomputation: collect the banded rows and fold the
    // per-band bucket histogram in plain Scala
    val docs = DedupOps.documents(spark, sfDir)
      .withColumn("norm", TextOps.normText(col("text")))
    val sigs = DedupOps.shingleSets(docs).select(col("doc_id"),
      graft.functions.MinHashSignature(col("sh")).as("sig"))
    val banded = DedupOps.bandsOfSigs(sigs)
      .as[(Long, Int, Long)].collect()
    val cap = DedupOps.maxBucketSize
    val want = banded.groupBy(_._2).map { case (band, rows) =>
      val sizes = rows.groupBy(_._3).values.map(_.length.toLong).toSeq
      def pairs(n: Long) = n * (n - 1) / 2
      band.toLong -> ((band.toLong, sizes.length.toLong, sizes.max,
        sizes.map(pairs).sum,
        sizes.filter(_ <= cap).map(pairs).sum,
        sizes.filter(_ > cap).sum,
        sizes.count(_ > cap).toLong))
    }
    assert(census == want, "census diverges from histogram fold")

    // capped pair mass is an upper bound on the operator's actual
    // DISTINCT candidate count (a pair may collide in several bands)
    val actualPairs = DedupOps.minhashLsh(spark, sfDir).count()
    val cappedMass = census.values.map(_._5).sum
    assert(cappedMass >= actualPairs,
      s"capped mass $cappedMass < verified pairs $actualPairs")

    // internal consistency: no mega-buckets ⇔ raw == capped, dropped == 0
    for ((band, (_, _, _, raw, capped, dropped, mega)) <- census) {
      if (mega == 0L) {
        assert(raw == capped && dropped == 0L, s"band $band")
      } else {
        assert(raw > capped && dropped > cap, s"band $band")
      }
    }
  }
}
