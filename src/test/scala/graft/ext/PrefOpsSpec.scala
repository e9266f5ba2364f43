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

  /** Driver twin of the fixed-point MM iteration in
    * [[PrefOps.btStrengthsFrom]] — same integer units, same virtual
    * prior matches, Long `/` ≡ Spark `div` on the non-negative
    * operands.
    */
  private def btDriver(matches: Seq[(String, String, String, String)],
                       universe: Seq[(String, String)])
      : Map[(String, String), Long] = {
    val s1 = PrefOps.btScale
    val s2 = s1 * s1
    val stats = matches.flatMap { case (lang, a, b, wnr) =>
      Seq(((lang, a), wnr == a), ((lang, b), wnr == b))
    }.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toMap
    val pc = matches.groupBy(m => (m._1, m._2, m._3)).view
      .mapValues(_.size.toLong).toSeq
      .flatMap { case ((lang, a, b), n) =>
        Seq(((lang, a), (lang, b), n), ((lang, b), (lang, a), n))
      }
    var pi = universe.map(k => k -> s1).toMap
    for (_ <- 1 to PrefOps.btIters) {
      val prev = pi
      pi = universe.map { k =>
        val den = pc.collect { case (s, t, n) if s == k =>
          n * s2 / (prev(s) + prev(t))
        }.sum
        val (_, w) = stats.getOrElse(k, (0L, 0L))
        k -> math.max(1L, (w + 1) * s2 / (den + 2 * s2 / (prev(k) + s1)))
      }.toMap
    }
    pi
  }

  /** The tournament match list, recomputed on the driver (the
    * sourceWinRate recompute's derivation, shared by the BT tests).
    */
  private def driverMatches: Seq[(String, String, String, String)] = {
    val q = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val heads = docs.groupBy(d => (d._2, d._3))
      .view.mapValues(_.map(_._1).sorted.take(PrefOps.tournamentK)).toMap
    for {
      ((lang, sa), ids1) <- heads.toSeq
      ((l2, sb), ids2) <- heads.toSeq
      if l2 == lang && sa < sb
      (a, b) <- ids1.zip(ids2)
    } yield {
      val winner =
        if (q(a) > q(b)) sa
        else if (q(b) > q(a)) sb
        else if (a < b) sa else sb
      (lang, sa, sb, winner)
    }
  }

  test("BT strengths and ranks match the driver fixed-point twin") {
    val universe = docs.map(d => (d._2, d._3)).distinct
    val pi = btDriver(driverMatches, universe)
    val expected = pi.toSeq.groupBy(_._1._1).toSeq.flatMap {
      case (_, rows) =>
        rows.sortBy { case ((_, src), p) => (-p, src) }.zipWithIndex
          .map { case (((lang, src), p), i) =>
            (lang, src, p.toDouble / PrefOps.btScale.toDouble,
              (i + 1).toLong)
          }
    }.toSet
    val got = PrefOps.sourceBt(spark, sfDir)
      .select("lang", "source", "bt", "rank")
      .as[(String, String, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("mix shares are the exact integer permille of BT strength") {
    val universe = docs.map(d => (d._2, d._3)).distinct
    val pi = btDriver(driverMatches, universe)
    val wins = PrefOps.sourceWinRate(spark, sfDir)
      .select("lang", "source", "n_wins")
      .as[(String, String, Long)].collect()
    val expected = wins.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      val tot = rows.map(r => pi((lang, r._2))).sum
      rows.map(r => (lang, r._2, r._3, 1000L * pi((lang, r._2)) / tot))
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

  test("BT corrects the unbalanced-schedule misranking raw win rate " +
      "makes, and a sole source sits exactly at the prior") {
    // the schedule-bias fixture: y_upset only ever plays the proven
    // strong source and wins 60% of 20; x_bully farms the floor —
    // 20 matches against the weakest source, winning 15. Raw Laplace
    // win rate crowns x_bully (16/22 ≈ .73 vs s_strong's 19/32 ≈ .59
    // vs y_upset's 13/22 ≈ .59) — strength of schedule is invisible
    // to win share. BT sees WHO was beaten: 75% over the floor pins
    // π_x at ~3·π_floor, far below the proven strong source. (The
    // bully must have real losses — an UNBEATEN source is correctly
    // rated high by BT however weak its schedule, since only the
    // virtual prior loss anchors it.)
    val lang = "xx"
    val matches =
      (1 to 20).map(i => (lang, "s_strong", "y_upset",
        if (i <= 12) "y_upset" else "s_strong")) ++
      (1 to 20).map(i => (lang, "x_bully", "z_floor",
        if (i <= 15) "x_bully" else "z_floor")) ++
      (1 to 10).map(_ => (lang, "s_strong", "z_floor", "s_strong"))
    val universe = Seq(lang -> "s_strong", lang -> "y_upset",
      lang -> "x_bully", lang -> "z_floor", lang -> "solo_src")
    val mDf = matches.toDF("lang", "s1", "s2", "winner")
    val uDf = universe.toDF("lang", "source")
    val out = PrefOps.btStrengthsFrom(mDf, uDf)
      .select("source", "n_matches", "n_wins", "pi")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out.values.foreach(v => assert(v._3 > 0L))

    // raw win rates (the misrank): x_bully on top
    def raw(s: String) =
      (out(s)._2 + 1).toDouble / (out(s)._1 + 2).toDouble
    assert(raw("x_bully") > raw("s_strong") &&
      raw("s_strong") > raw("y_upset"),
      s"fixture lost its misrank: ${universe.map(u => raw(u._2))}")

    // BT: y_upset (beats the strong source 60%) outranks both, and
    // x_bully (only ever beat the floor) falls below s_strong
    val pi = out.view.mapValues(_._3).toMap
    assert(pi("y_upset") > pi("s_strong"),
      s"BT did not reward beating the strong source: $pi")
    assert(pi("s_strong") > pi("x_bully"),
      s"BT still overrates the floor-farmer: $pi")
    assert(pi("x_bully") > pi("z_floor"), s"BT order broke at the tail: $pi")

    // sole source: exactly the prior at every iteration (w̃=1 and the
    // virtual matches are its whole schedule — the 1/2-prior law)
    assert(pi("solo_src") == PrefOps.btScale,
      s"sole source drifted off the prior: ${pi("solo_src")}")

    // the driver twin agrees with the DataFrame fixed point
    val twin = btDriver(matches, universe)
    universe.foreach { k =>
      assert(twin(k) == pi(k._2), s"driver twin diverged at $k")
    }
  }

  test("BT refuses a lang with more sources than the cap, loudly, " +
      "before any tournament work") {
    // the |sources|² tournament is only sane at curated-tag cardinality;
    // web-domain-sized universes must fail with instructions, not
    // quadratic silently (the TopKPerKey key-cap discipline)
    val n = PrefOps.btMaxSourcesPerLang.toInt + 1
    val universe = (1 to n).map(i => ("xx", f"src_$i%04d")).toDF(
      "lang", "source")
    val matches = Seq(("xx", "a", "b", "a")).toDF("lang", "s1", "s2",
      "winner")
    val e = intercept[IllegalArgumentException] {
      PrefOps.btStrengthsFrom(matches, universe)
    }
    assert(e.getMessage.contains(s"${PrefOps.btMaxSourcesPerLang} cap"),
      s"cap message missing: ${e.getMessage}")
    // one under the cap still fits
    val ok = PrefOps.btStrengthsFrom(matches,
      (1 to n - 1).map(i => ("xx", f"src_$i%04d")).toDF("lang", "source"))
    assert(ok.count() == (n - 1).toLong)
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
