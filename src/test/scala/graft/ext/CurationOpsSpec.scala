package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition fractions are well-formed and flag agrees with thresholds") {
    val rows = CurationOps.repetition(spark, sfDir)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    // one row per document, including token-less ones
    assert(rows.length ==
      TextOps.documents(spark, sfDir).count().toInt)
    rows.foreach { case (id, n, dup1, top2, dup3, flagged) =>
      assert(n >= 0L)
      Seq(dup1, top2, dup3).foreach(f =>
        assert(f >= 0.0 && f <= 1.0, s"doc $id frac $f out of range"))
      assert(flagged ==
        (top2 > CurationOps.topBigramFracMax ||
          dup3 > CurationOps.dupTrigramFracMax))
    }
    // the fixture vocabulary repeats heavily: the signals must fire on a
    // real spread, not collapse to a constant
    assert(rows.map(_._4).distinct.length > 10)
  }

  test("repetition signals match a hand computation on a tiny frame") {
    // "a b a b" → tokens 4, all duplicated; bigrams (a b, b a, a b) →
    // top 2/3; trigrams (a b a, b a b) → no repeats
    val one = CurationOps.repetition(spark, sfDir)
    val doc = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normText(col("text")).as("t"))
      .as[(Long, String)].collect()
      .find(_._2.split(" ").length >= 4).get
    val toks = doc._2.split(" ").filter(_.nonEmpty).toSeq
    val n1 = toks.length.toLong
    val dup1 = toks.groupBy(identity).values
      .collect { case g if g.size > 1 => g.size }.sum.toLong
    val row = one.filter(col("doc_id") === doc._1)
      .select("n_tokens", "dup_token_frac").as[(Long, Double)].head()
    assert(row._1 == n1)
    assert(math.abs(row._2 - dup1.toDouble / n1) < 1e-12)
  }

  test("decontaminate: bench docs excluded; hits are real shared grams") {
    val out = CurationOps.decontaminate(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, c) =>
      assert(id % CurationOps.decontBenchMod != 0, s"bench doc $id in output")
      assert(n >= 0L)
      assert(c == (n > 0L))
    }
    // recompute one contaminated doc's shared-gram count from raw text
    def gramsOf(text: String): Set[String] = {
      val t = text.toLowerCase.trim.replaceAll("\\s+", " ")
        .split(" ").filter(_.nonEmpty)
      if (t.length < CurationOps.decontGramTokens) Set.empty
      else t.sliding(CurationOps.decontGramTokens).map(_.mkString(" ")).toSet
    }
    val texts = TextOps.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val benchGrams = texts.collect {
      case (id, tx) if id % CurationOps.decontBenchMod == 0 => gramsOf(tx)
    }.fold(Set.empty[String])(_ ++ _)
    val someHit = out.find(_._3)
    assert(someHit.isDefined, "fixture should contain contamination")
    val (hitId, hitN, _) = someHit.get
    assert(gramsOf(texts(hitId)).count(benchGrams.contains) == hitN)
  }

  test("pack sequences: contiguous fill, conserved tokens, shard-bounded") {
    val out = CurationOps.packSequences(spark, sfDir)
      .as[(Long, String, Long, String, Long, Long)].collect()
    val docs = TextOps.documents(spark, sfDir).count()
    assert(out.length == docs.toInt) // every doc lands in exactly one pack
    // pack_tokens is the sum of member n_tokens; pack_pos is 1..|pack|
    out.groupBy(_._4).foreach { case (pack, members) =>
      assert(members.map(_._3).sum == members.head._6, pack)
      assert(members.map(_._5).sorted.toSeq == (1L to members.length).toSeq)
    }
    // contiguity: within (lang, shard), doc_id order ⇒ bin is
    // non-decreasing (a later doc never lands in an earlier pack)
    out.groupBy(r => (r._2, r._1 % CurationOps.packShards))
      .foreach { case (_, members) =>
        val bins = members.sortBy(_._1).map(_._4.split("#").last.toLong)
        assert(bins.sameElements(bins.sorted))
      }
    // budget respected at the start boundary: all members but the last
    // start inside the pack's budget window, so their token mass — i.e.
    // pack_tokens minus the last member — is strictly under the budget
    // (the last member may overflow; that's the streaming-fill contract)
    out.groupBy(_._4).foreach { case (pack, members) =>
      val last = members.maxBy(_._5)
      assert(members.head._6 - last._3 < CurationOps.packBudgetTokens, pack)
    }
  }

  test("int8 quantization: bounds, zero-scale safety, small MSE") {
    val rows = VectorOps.quantizeInt8(spark, sfDir)
      .as[(Long, Double, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, qMin, qMax, qL1, mse) =>
      assert(scale >= 0.0)
      assert(qMin >= -127L && qMax <= 127L, s"vec $id out of int8 range")
      assert(qL1 >= 0L)
      // dequantization error per element is at most (scale/254)² on the
      // round step; allow the fixture's dimensionality some slack
      assert(mse >= 0.0)
      if (scale > 0) {
        val step = scale / 127.0
        assert(mse <= step * step, s"vec $id mse $mse step² ${step * step}")
        // max|x| quantizes to ±127 exactly
        assert(qMax == 127L || qMin == -127L, s"vec $id extremes")
      }
    }
  }

  test("decontaminateBloom is row-identical to the exact decontaminate") {
    // the Bloom pass may only PRE-filter: no false negatives by the Bloom
    // guarantee, false positives killed by the exact join — so the two
    // plans must agree cell-for-cell
    val exact = CurationOps.decontaminate(spark, sfDir)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val bloom = CurationOps.decontaminateBloom(spark, sfDir)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(exact.nonEmpty)
    assert(bloom.toSeq == exact.toSeq)
    // the fixture must actually exercise both branches of `contaminated`
    assert(exact.exists(_._3) && exact.exists(!_._3))
  }

  test("contaminationScore agrees with decontaminate and its own ratio") {
    val exact = CurationOps.decontaminate(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, sh, c) => id -> (sh, c) }.toMap
    val scored = CurationOps.contaminationScore(spark, sfDir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(scored.map(_._1).toSet == exact.keySet) // same training slice
    scored.foreach { case (id, g, sh, ratio, flagged) =>
      assert(sh == exact(id)._1, s"shared-gram count differs at doc $id")
      assert(sh <= g, s"shared > total at doc $id")
      assert(ratio >= 0.0 && ratio <= 1.0)
      val expRatio = if (g > 0) sh.toDouble / g.toDouble else 0.0
      assert(ratio == expRatio, s"ratio mismatch at doc $id")
      assert(flagged == (ratio > CurationOps.contamRatioMax))
    }
    // the threshold must split the fixture (both flag branches exercised)
    assert(scored.exists(_._5) && scored.exists(!_._5))
  }

  test("decontaminateSpans cuts benchmark-overlapping spans (brute force)") {
    import spark.implicits._
    val g = CurationOps.decontGramTokens
    val leak = "alpha beta gamma delta epsilon zeta eta theta"
    // doc_id % 10 == 0 → benchmark; the rest are training
    val docs = Seq(
      (10L, s"benchmark question says $leak end of prompt"),
      (11L, s"intro words here $leak trailing training text goes on"),
      (12L, "a completely clean training document with its own words only"),
      (13L, s"$leak"), // fully contaminated: everything removed
      (20L, s"another benchmark row $leak again"))
    val df = docs.toDF("doc_id", "text")

    // brute force straight from the scaladoc semantics
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.replaceAll("\\s+", " ")
        .split(" ").filter(_.nonEmpty).toVector
    }.toMap
    val spanOf = (ts: Vector[String]) =>
      (0 to ts.length - g).map(i => i -> ts.slice(i, i + g).mkString(" "))
    val benchGrams = toks.collect { case (id, ts) if id % 10 == 0 =>
      spanOf(ts).map(_._2)
    }.flatten.toSet
    val exp = toks.collect { case (id, ts) if id % 10 != 0 =>
      val removed = spanOf(ts).collect {
        case (i, s) if benchGrams.contains(s) => i until i + g
      }.flatten.toSet
      val keptToks = ts.zipWithIndex.collect {
        case (t, j) if !removed.contains(j) => t
      }
      val frac = if (ts.nonEmpty) removed.size.toDouble / ts.length else 0.0
      (id, ts.length.toLong, removed.size.toLong, frac,
        keptToks.mkString(" "))
    }.toSet

    val got = CurationOps.decontaminateSpansDocs(df)
      .as[(Long, Long, Long, Double, String)].collect().toSet
    assert(got == exp)
    val byId = got.map(r => r._1 -> r).toMap
    assert(!byId.contains(10L) && !byId.contains(20L),
      "benchmark docs must not appear in the output")
    assert(byId(11L)._3 > 0L && byId(11L)._5.startsWith("intro words here"))
    assert(byId(12L)._3 == 0L, "clean doc must be untouched")
    assert(byId(13L)._3 == byId(13L)._2 && byId(13L)._5 == "",
      "fully contaminated doc loses everything")
  }

  test("boilerplate flags the seeded banner prefix and nothing else") {
    val rows = CurationOps.boilerplate(spark, sfDir)
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val banner = CurationOps.boilerplateBanner.trim
      .split(" ").take(CurationOps.boilerplatePrefixLen).mkString(" ")
    rows.foreach { case (src, prefix, n, tot, share) =>
      assert(prefix == banner, s"$src flagged a non-banner prefix: $prefix")
      assert(share > CurationOps.boilerplateShareMin && share <= 1.0)
      assert(n <= tot)
    }
    // every source seeds ~2/3 of its docs, so every source is flagged
    val sources = graft.ext.TextOps.documents(spark, sfDir)
      .select("source").distinct().as[String].collect().toSet
    assert(rows.map(_._1).toSet == sources)
  }


  test("boilerplate apply strips the banner from hits and nothing else") {
    val banner8 = CurationOps.boilerplateBanner.trim.split(" ")
      .take(CurationOps.boilerplatePrefixLen)
    val got = CurationOps.boilerplateApply(spark, sfDir)
      .as[(Long, String, Boolean, Long)].collect()
    assert(got.exists(_._3) && got.exists(!_._3))
    got.foreach { case (id, cleaned, removed, n) =>
      assert(n == (if (removed) CurationOps.boilerplatePrefixLen.toLong else 0L))
      if (removed) {
        assert(id % 3 != 0, s"unseeded doc $id flagged")
        // the surviving text must not START with the banner again
        assert(!cleaned.split(" ").take(banner8.length).sameElements(banner8)
          || cleaned.isEmpty)
      }
    }
    // seeded docs with >= prefixLen tokens are exactly the removed set
    val seededHits = got.filter(_._3).map(_._1).toSet
    assert(seededHits.nonEmpty)
    assert(seededHits.forall(_ % 3 != 0))
  }

  test("line boilerplate flags the seeded mid-banner and footer, nothing else") {
    val rows = CurationOps.lineBoilerplate(spark, sfDir)
      .as[(String, String, Long, Long, Double)].collect()
    val sources = TextOps.documents(spark, sfDir)
      .select("source").distinct().as[String].collect().toSet
    val bySource = rows.groupBy(_._1)
    assert(bySource.keySet == sources)
    sources.foreach { s =>
      val lines = bySource(s).map(_._2).toSet
      assert(lines == Set(CurationOps.lineBannerMid, CurationOps.lineFooter),
        s"$s flagged: $lines")
    }
    rows.foreach { case (_, line, n, tot, share) =>
      assert(share > CurationOps.lineShareMin && share <= 1.0)
      assert(n <= tot)
      // the banner seeds 2/3 of docs, the footer 6/7
      if (line == CurationOps.lineBannerMid)
        assert(math.abs(share - 2.0 / 3.0) < 0.05, s"banner share $share")
      else assert(math.abs(share - 6.0 / 7.0) < 0.05, s"footer share $share")
    }
  }

  test("line boilerplate apply cuts flagged lines mid-doc; others byte-stable") {
    val got = CurationOps.lineBoilerplateApply(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, cleaned, _, nRemoved) =>
      val kept = cleaned.split("\n", -1).filter(_.nonEmpty)
      assert(!kept.contains(CurationOps.lineBannerMid),
        s"doc $id kept the mid-document banner")
      assert(!kept.contains(CurationOps.lineFooter),
        s"doc $id kept the footer")
      // exactly the seeded lines were cut — never document content
      val expected = (if (id % 3 != 0) 1L else 0L) +
        (if (id % 7 != 0) 1L else 0L)
      assert(nRemoved == expected,
        s"doc $id removed $nRemoved lines, expected $expected")
    }
    // fully-unseeded docs keep every line (byte-stable pass-through)
    val unseeded = got.filter(r => r._1 % 3 == 0 && r._1 % 7 == 0)
    assert(unseeded.nonEmpty)
    unseeded.foreach { case (id, _, _, nRemoved) =>
      assert(nRemoved == 0L, s"unseeded doc $id lost lines")
    }
  }

  test("gopher rules: bits agree with measurements; seeds fire their rules") {
    val rows = CurationOps.gopherRules(spark, sfDir)
      .select("doc_id", "n_words", "mean_word_len", "bullet_share",
        "ellipsis_share", "n_stop_hits", "fail_mask", "pass")
      .as[(Long, Long, Double, Double, Double, Long, Long, Boolean)]
      .collect()
    assert(rows.length ==
      TextOps.documents(spark, sfDir).count().toInt)
    rows.foreach { case (id, nw, mwl, bs, es, stops, mask, pass) =>
      assert(pass == (mask == 0L), s"doc $id pass/mask disagree")
      // bit 0 (word count) and bit 3/4 (bullet/ellipsis) re-derived
      assert(((mask & 1L) != 0L) ==
        (nw < CurationOps.gopherMinWords ||
          nw > CurationOps.gopherMaxWords), s"doc $id word-count bit")
      assert(((mask & 8L) != 0L) ==
        (bs > CurationOps.gopherMaxBulletShare), s"doc $id bullet bit")
      assert(((mask & 16L) != 0L) ==
        (es > CurationOps.gopherMaxEllipsisShare), s"doc $id ellipsis bit")
      assert(((mask & 64L) != 0L) ==
        (stops < CurationOps.gopherMinStopHits), s"doc $id stopword bit")
      // every bullet-seeded doc has bullet share exactly 1.0 → fails
      if (id % 11 == 3) assert(bs == 1.0 && (mask & 8L) != 0L,
        s"bullet-seeded doc $id did not fail the bullet rule")
      if (id % 13 == 4) assert(es == 1.0 && (mask & 16L) != 0L,
        s"ellipsis-seeded doc $id did not fail the ellipsis rule")
      assert(mwl > 0.0)
    }
    // the battery must separate the corpus, not collapse to one verdict
    assert(rows.exists(_._8) && rows.exists(!_._8))
    // and more than one distinct failure combination must occur
    assert(rows.map(_._7).distinct.length > 3)
  }

  test("length batches: bounded size, correct buckets, beats naive padding") {
    val rows = CurationOps.lengthBatches(spark, sfDir)
      .as[(Long, String, Long, Long, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val bounds = CurationOps.lenBucketBounds
    rows.foreach { case (id, _, n, bucket, _, bmax, pad) =>
      // bucket bounds: n fits its bucket and not the one below
      assert(n <= bounds(bucket.toInt), s"doc $id over bucket bound")
      if (bucket > 0)
        assert(n > bounds(bucket.toInt - 1), s"doc $id under bucket")
      assert(pad == bmax - n && pad >= 0L)
    }
    // no batch exceeds the configured size
    rows.groupBy(_._5).foreach { case (bid, docs) =>
      assert(docs.length <= CurationOps.lenBatchSize, s"batch $bid")
    }
    // padding with length bucketing must beat naive doc_id-order
    // batching of the same docs (the operator's whole point)
    val naive = rows.sortBy(_._1).grouped(CurationOps.lenBatchSize)
      .flatMap { g => val m = g.map(_._3).max; g.map(m - _._3) }.sum
    val bucketed = rows.map(_._7).sum
    assert(bucketed < naive,
      s"bucketed padding $bucketed !< naive $naive")
  }

}
