package graft.ext

import graft.SparkSpec

class PrefOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)].collect()

  test("pairing is consecutive, non-overlapping, and stratum-complete") {
    val pairs = PrefOps.prefPairs(spark, sfDir)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
    val used = pairs.flatMap(p => Seq(p._3, p._4))
    assert(used.distinct.length == used.length,
      "a document appears in more than one pair")
    // exactly floor(|stratum| / 2) pairs per (lang, source)
    val expected = docs.groupBy(d => (d._2, d._3))
      .view.mapValues(_.size / 2).toMap.filter(_._2 > 0)
    val got = pairs.groupBy(_._2) // only lang in the output; recount via ids
    val byStratum = {
      val strat = docs.map(d => d._1 -> (d._2, d._3)).toMap
      pairs.groupBy(p => strat(p._3)).view.mapValues(_.size).toMap
    }
    assert(byStratum == expected, s"$byStratum vs $expected")
    // chosen and rejected always share a stratum and are doc_id-adjacent
    // in the stratum's doc_id order
    val strat = docs.map(d => d._1 -> (d._2, d._3)).toMap
    for (p <- pairs)
      assert(strat(p._3) == strat(p._4), s"cross-stratum pair $p")
    assert(got.nonEmpty)
  }

  test("verdicts, margin, and agreement match a driver recompute") {
    val q = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val r = CurationOps.repetition(spark, sfDir)
      .select("doc_id", "dup_token_frac", "dup_trigram_frac")
      .as[(Long, Double, Double)].collect()
      .map(x => x._1 -> (x._2 + x._3)).toMap
    val stratOrder = docs.groupBy(d => (d._2, d._3))
      .view.mapValues(_.map(_._1).sorted).toMap
    val expected = stratOrder.flatMap { case ((lang, src), ids) =>
      ids.grouped(2).filter(_.size == 2).zipWithIndex.map {
        case (pairIds, i) =>
          val (a, b) = (pairIds(0), pairIds(1))
          val chosenQ =
            if (q(a) > q(b)) a else if (q(b) > q(a)) b else math.min(a, b)
          val chosenR =
            if (r(a) < r(b)) a else if (r(b) < r(a)) b else math.min(a, b)
          (s"$lang#$src#${i + 1}", lang, chosenQ,
            if (chosenQ == a) b else a,
            math.abs(q(a) - q(b)), chosenQ == chosenR)
      }
    }.toSet
    val gotPairs = PrefOps.prefPairs(spark, sfDir)
      .as[(String, String, Long, Long, Double, Boolean)].collect().toSet
    assert(gotPairs == expected)
  }

  test("length-bias audit is the exact rollup of the pair table") {
    val nChars = docs.map(d => d._1 -> d._4).toMap
    val pairs = PrefOps.prefPairs(spark, sfDir)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
    val expected = pairs.groupBy(_._2).map { case (lang, ps) =>
      val agreed = ps.filter(_._6)
      val longer = agreed.count(p => nChars(p._3) > nChars(p._4))
      (lang, ps.length.toLong, agreed.length.toLong,
        agreed.length.toDouble / ps.length.toDouble, longer.toLong,
        if (agreed.nonEmpty) longer.toDouble / agreed.length.toDouble
        else 0.0)
    }.toSet
    val got = PrefOps.prefLengthBias(spark, sfDir)
      .as[(String, Long, Long, Double, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("export ships exactly the agreed above-margin pairs with texts") {
    val texts = TextOps.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val pairs = PrefOps.prefPairs(spark, sfDir)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
    val expected = pairs
      .filter(p => p._6 && p._5 >= PrefOps.prefMarginMin)
      .map(p => (p._1, p._2, p._3, p._4, p._5, texts(p._3), texts(p._4)))
      .toSet
    assert(expected.nonEmpty, "margin floor must not empty the fixture")
    assert(expected.size < pairs.length, "margin floor must drop something")
    val got = PrefOps.prefExport(spark, sfDir)
      .as[(String, String, Long, Long, Double, String, String)]
      .collect().toSet
    assert(got == expected)
  }

  test("mix shares are the exact integer permille of smoothed win mass") {
    val wins = PrefOps.sourceWinRate(spark, sfDir)
      .select("lang", "source", "n_wins")
      .as[(String, String, Long)].collect()
    val expected = wins.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      val tot = rows.map(_._3 + 1).sum
      rows.map(r => (lang, r._2, r._3, 1000L * (r._3 + 1) / tot))
    }.toSet
    val got = PrefOps.sourceMixShares(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == expected)
    // per lang: shares form a near-partition of 1000 (floor loss < |sources|)
    for ((lang, rows) <- got.groupBy(_._1)) {
      val s = rows.toSeq.map(_._4).sum
      assert(s <= 1000 && s > 1000 - rows.size, s"$lang shares sum $s")
    }
  }

  test("source tournament matches a driver recompute; heads use the heap") {
    val q = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val heads = docs.groupBy(d => (d._2, d._3))
      .view.mapValues(_.map(_._1).sorted.take(PrefOps.tournamentK)).toMap
    val matches = for {
      ((lang, s1), ids1) <- heads.toSeq
      ((l2, s2), ids2) <- heads.toSeq
      if l2 == lang && s1 < s2
      (a, b) <- ids1.zip(ids2)
    } yield {
      val winner =
        if (q(a) > q(b)) s1
        else if (q(b) > q(a)) s2
        else if (a < b) s1 else s2
      (lang, s1, s2, winner)
    }
    val stats = matches.flatMap { case (lang, s1, s2, wnr) =>
      Seq((lang, s1, wnr == s1), (lang, s2, wnr == s2))
    }.groupBy(x => (x._1, x._2)).view
      .mapValues(v => (v.size.toLong, v.count(_._3).toLong)).toMap
    val expected = docs.map(d => (d._2, d._3)).distinct.map { case key =>
      val (n, wins) = stats.getOrElse(key, (0L, 0L))
      (key._1, key._2, n, wins, (wins + 1).toDouble / (n + 2).toDouble)
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (-r._5, r._2)).zipWithIndex.map {
        case (r, i) => (r._1, r._2, r._3, r._4, r._5, (i + 1).toLong)
      }
    }.toSet
    val frame = PrefOps.sourceWinRate(spark, sfDir)
    val got = frame.as[(String, String, Long, Long, Double, Long)]
      .collect().toSet
    assert(got == expected)
    // the rn <= K head compiles to the sort-free heap via the rewrite
    val p = frame.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"),
      "tournament head lost the heap operator")
  }
}
