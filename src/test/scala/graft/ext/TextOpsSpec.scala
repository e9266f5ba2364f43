package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("normText collapses whitespace, trims, lowercases") {
    val r = Seq("  Hello   WORLD \t x ").toDF("text")
      .select(TextOps.normText(col("text"))).as[String].head()
    assert(r == "hello world x")
  }

  test("langId markers identify real multilingual samples") {
    val samples = Seq(
      (1L, "The cat and the dog is going to the park"), // en
      (2L, "Der Hund und die Katze, das ist gut"), // de
      (3L, "el perro y la casa es grande y los gatos"), // es
      (4L, "le chien et la maison est grande, les chats"), // fr
      (5L, "你好世界这是中文")) // zh
      .toDF("doc_id", "text")
    val scored = TextOps.langMarkers.foldLeft(
      samples.withColumn("norm", TextOps.normText(col("text")))) {
      case (acc, (l, pat)) =>
        acc.withColumn(s"score_$l", regexp_count(col("norm"), lit(pat)))
    }
    val best = scored.collect().map { r =>
      r.getLong(0) -> TextOps.langMarkers.map { case (l, _) =>
        l -> r.getAs[Int](s"score_$l")
      }.maxBy(_._2)._1
    }.toMap
    assert(best == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "zh"))
  }

  test("dedupExact groups identical normalized content under one winner") {
    val docs = TextOps.documents(spark, sfDir)
    val deduped = TextOps.dedupExact(spark, sfDir)
    // every winner is a real doc, every group accounted for
    assert(deduped.agg(sum("n_copies")).as[Long].head() == docs.count())
    // whitespace-variant copies collapse: simulate by unioning a variant
    val variant = docs.limit(1)
      .withColumn("text", concat(lit("  "), upper(col("text"))))
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val withVariant = docs.union(variant)
      .withColumn("text_sha", sha2(TextOps.normText(col("text")), 256))
      .groupBy("text_sha").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(withVariant.count() >= 1)
  }

  test("quality score stays within [0, 1]") {
    val q = TextOps.qualityScore(spark, sfDir)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1)
      .count() == 0)
  }

  test("doc chunks cover every token with the declared overlap") {
    import spark.implicits._
    val chunks = TextOps.docChunks(spark, sfDir)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normText(col("text")).as("norm"))
      .as[(Long, String)].collect()
      .filter(_._2.nonEmpty).toMap
    assert(chunks.keySet == docs.keySet)
    for ((id, cs) <- chunks) {
      val toks = docs(id).split(" ")
      // chunk indices are dense from 0
      assert(cs.map(_._2).toSeq == (0L until cs.length).toSeq)
      // reconstruction: chunk i dropped of its overlap prefix (i > 0)
      // concatenates back to the exact token stream — full coverage,
      // nothing duplicated beyond the declared overlap
      val rebuilt = cs.flatMap { case (_, i, text, _) =>
        val t = text.split(" ")
        if (i == 0L) t else t.drop(TextOps.chunkOverlap)
      }
      assert(rebuilt.toSeq == toks.toSeq, s"doc $id chunk coverage broken")
      // every chunk except possibly the last is exactly the budget
      cs.init.foreach { c =>
        assert(c._4 == TextOps.chunkTokens.toLong, s"doc $id: $c")
      }
      assert(cs.last._4 > 0 && cs.last._4 <= TextOps.chunkTokens)
    }
  }

  test("vocabBuild: dense ids in (freq desc, token) order, cutoff applied") {
    val rows = TextOps.vocabBuild(spark, sfDir)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong)) // dense ids
    rows.foreach { case (_, _, f) => assert(f >= TextOps.vocabMinFreq) }
    rows.sliding(2).foreach {
      case Array((_, tA, fA), (_, tB, fB)) =>
        assert(fA > fB || (fA == fB && tA < tB),
          s"vocab order broken at $tA/$tB")
      case _ =>
    }
    // cross-check one token's frequency against a driver-side count
    val probe = rows.head
    val counted = TextOps.documents(spark, sfDir)
      .select(TextOps.normText(col("text")).as("n")).as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty)).count(_ == probe._2)
    assert(counted == probe._3)
  }

  /** Driver-side tokenization identical to normText + split for the
    * brute-force cross-checks below.
    */
  private def fixtureToks(): Array[(Long, String, Array[String])] =
    TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        TextOps.normText(col("text")).as("n"))
      .as[(Long, String, String)].collect()
      .map { case (id, lang, n) =>
        (id, lang, n.split(" ").filter(_.nonEmpty))
      }

  test("invertedIndex: df/cf/postings head equal a brute-force recount") {
    val docs = fixtureToks()
    val byTok = docs.flatMap { case (id, _, ts) => ts.map(t => (t, id)) }
    val exp = byTok.groupBy(_._1).map { case (tok, hits) =>
      val ids = hits.map(_._2)
      (tok, (ids.distinct.length.toLong, ids.length.toLong,
        ids.distinct.sorted.take(TextOps.postingsHead).mkString(",")))
    }
    val got = TextOps.invertedIndex(spark, sfDir)
      .as[(String, Long, Long, String)].collect()
      .map { case (t, df, cf, h) => (t, (df, cf, h)) }.toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (tok, e) =>
      assert(got(tok) == e, s"inverted index row differs for '$tok'")
    }
  }

  test("bm25: top-k per lang equals a brute-force scorer") {
    val docs = fixtureToks()
    val expAll = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      val tf = ds.map { case (id, _, ts) =>
        id -> ts.groupBy(identity).map { case (t, o) => t -> o.length }
      }.toMap
      val dl = tf.map { case (id, m) => id -> m.values.sum.toLong }
      val n = dl.size.toLong
      val avgdl = dl.values.sum.toDouble / n.toDouble
      val dfTok = tf.values.flatMap(_.keys).groupBy(identity)
        .map { case (t, o) => t -> o.size.toLong }
      val terms = dfTok.toSeq.sortBy { case (t, d) => (-d, t) }.take(2)
      val scored = tf.keys.toSeq.flatMap { id =>
        val s = terms.map { case (t, d) =>
          tf(id).get(t).fold(0.0) { f =>
            ((n.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5)) *
              ((f.toDouble * 2.2) /
                (f.toDouble + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)))
          }
        }.sum
        if (terms.exists { case (t, _) => tf(id).contains(t) })
          Some((id, s)) else None
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(TextOps.bm25TopK)
        .zipWithIndex.map { case ((id, s), i) =>
          (lang, i + 1L, id) -> s
        }
    }
    val got = TextOps.bm25(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
      .map { case (l, r, id, s) => (l, r, id) -> s }.toMap
    assert(got.keySet == expAll.keySet,
      s"bm25 ranked sets differ: ${got.keySet -- expAll.keySet} / " +
        s"${expAll.keySet -- got.keySet}")
    expAll.foreach { case (k, s) =>
      assert(math.abs(got(k) - s) < 1e-9, s"score differs at $k")
    }
  }

  test("collocations equal a brute-force top-M-capped pair recount") {
    val docs = fixtureToks()
    val kept = docs.map { case (id, _, ts) =>
      id -> ts.groupBy(identity).map { case (t, o) => t -> o.length }
        .toSeq.sortBy { case (t, f) => (-f, t) }
        .take(TextOps.cooccurTopM).map(_._1).toSet
    }
    val nDocs = docs.length.toLong
    val marg = kept.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => t -> o.length.toLong }
    val pairCount = kept.flatMap { case (_, ts) =>
      val s = ts.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        yield (s(i), s(j))
    }.groupBy(identity).map { case (p, o) => p -> o.length.toLong }
      .filter(_._2 >= TextOps.cooccurMinPairs)
    val exp = pairCount.map { case ((a, b), nAb) =>
      (a, b) -> (nAb, marg(a), marg(b),
        (nAb * nDocs).toDouble / (marg(a) * marg(b)).toDouble)
    }
    val got = TextOps.collocations(spark, sfDir)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map { case (a, b, nAb, nA, nB, r) => (a, b) -> (nAb, nA, nB, r) }
      .toMap
    assert(got == exp,
      s"collocation sets differ: got=${got.size} exp=${exp.size}")
    assert(got.nonEmpty, "fixture produced no collocations")
  }

  test("ngramDiversity matches a driver trigram recount") {
    val docs = TextOps.documents(spark, sfDir)
      .select(col("lang"), TextOps.normText(col("text")).as("norm"))
      .as[(String, String)].collect()
    val grams = docs.flatMap { case (lang, norm) =>
      val t = norm.split(" ").filter(_.nonEmpty)
      t.sliding(3).filter(_.length == 3).map(g => lang -> g.mkString(" "))
    }
    val exp = grams.groupBy(_._1).map { case (lang, gs) =>
      val total = gs.length.toLong
      val distinct = gs.map(_._2).distinct.length.toLong
      lang -> ((total, distinct, distinct.toDouble / total.toDouble))
    }
    val got = TextOps.ngramDiversity(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
      .map { case (l, n, d, r) => l -> ((n, d, r)) }.toMap
    assert(got == exp)
    // a synthetic template corpus repeats trigrams: ratio is truly < 1
    assert(got.values.exists(_._3 < 1.0))
  }

  test("rrfFusion equals a driver fusion of the two rank lists") {
    val bm = TextOps.bm25(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
      .map { case (lang, rank, id, _) => (lang, id) -> rank }.toMap
    val qualRank = {
      val langOf = TextOps.documents(spark, sfDir)
        .select(col("doc_id"), col("lang")).as[(Long, String)]
        .collect().toMap
      TextOps.qualityScore(spark, sfDir)
        .select(col("doc_id"), col("quality_score"))
        .as[(Long, Double)].collect()
        .map { case (id, q) => (langOf(id), id, q) }
        .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
          rows.sortBy { case (_, id, q) => (-q, id) }
            .zipWithIndex.take(TextOps.bm25TopK)
            .map { case ((_, id, _), i) => (lang, id) -> (i + 1L) }
        }.toMap
    }
    val exp = (bm.keySet ++ qualRank.keySet).toSeq.map { k =>
      def rr(r: Option[Long]) =
        r.map(x => 1.0 / (TextOps.rrfK.toDouble + x.toDouble)).getOrElse(0.0)
      k -> (rr(bm.get(k)) + rr(qualRank.get(k)))
    }.groupBy(_._1._1).flatMap { case (lang, rows) =>
      rows.sortBy { case ((_, id), s) => (-s, id) }
        .zipWithIndex.take(TextOps.rrfTopK)
        .map { case (((_, id), s), i) => (lang, i + 1L, id, s) }
    }.toSet
    val got = TextOps.rrfFusion(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("sourceCap keeps exactly the top-k quality docs per source") {
    val k = TextOps.sourceCapK
    val scored = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val bySource = TextOps.documents(spark, sfDir)
      .select("doc_id", "source").as[(Long, String)].collect()
      .groupBy(_._2)
    val exp = bySource.toSeq.flatMap { case (src, docs) =>
      docs.map(_._1).sortBy(id => (-scored(id), id)).take(k)
        .map(id => (id, src, scored(id)))
    }.toSet
    val got = TextOps.sourceCap(spark, sfDir)
      .as[(Long, String, Double)].collect().toSet
    assert(got == exp)
    // the cap really binds at this SF (each source holds > k docs)
    assert(bySource.values.exists(_.length > k))
  }

  test("normTextUnicode unifies canonically-equal spellings; normText does not") {
    val composed = "Caf\u00e9   Menu" // \u00e9 as one codepoint
    val decomposed = "Café   Menu" // e + combining acute
    val fullWidth = "\uFF23\uFF41\uFF46\u00e9\u3000 Menu" // full-width Caf + ideographic space
    val df = Seq(composed, decomposed, fullWidth).toDF("text")
      .select(
        TextOps.normText(col("text")).as("plain"),
        TextOps.normTextUnicode(col("text")).as("uni"),
        TextOps.normTextUnicode(col("text"), widthFold = true).as("folded"))
    val rows = df.as[(String, String, String)].collect()
    // plain normText keeps the two spellings distinct — the evasion the op closes
    assert(rows(0)._1 != rows(1)._1)
    // NFC unifies them
    assert(rows(0)._2 == rows(1)._2 && rows(0)._2 == "café menu")
    // width folding additionally unifies the full-width spelling
    assert(rows(2)._3 == "café menu")
    // ASCII fast path is the identity on already-normal text
    assert(graft.functions.UnicodeNorm.norm("plain ascii text", false)
      == "plain ascii text")
  }

  test("unicodeNormalize: unorm ≡ lower(text) on the ASCII fixture; changed ⇔ uppercase present") {
    val got = TextOps.unicodeNormalize(spark, sfDir)
      .as[(Long, String, Boolean)].collect()
    val src = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (id, unorm, changed) =>
      val t = src(id)
      assert(unorm == t.toLowerCase(java.util.Locale.ROOT), s"doc $id")
      assert(changed == (unorm != t), s"doc $id changed")
    }
  }

  test("HtmlExtract: tag strip + entity decode semantics, edge cases") {
    import graft.functions.HtmlExtract.extract
    // plain strip + decode
    assert(extract("<p>a &amp; b</p>") == "a & b")
    // self-closing and attribute-bearing tags vanish entirely
    assert(extract("""x<br/><a href="u?q=1&amp;r=2">link</a>y""") == "xlinky")
    // unclosed '<' is literal (exactly the <[^>]*> regex semantics)
    assert(extract("3 < 5 and plain") == "3 < 5 and plain")
    // '<' with a later '>' swallows through it, like the regex
    assert(extract("<a<b>kept") == "kept")
    // no double decode: &amp;lt; is the ENCODING of literal '&lt;'
    assert(extract("&amp;lt;") == "&lt;")
    // a removed tag joins the entity halves — strip must precede decode
    assert(extract("&am<b>p; x") == "& x")
    // unknown entities pass through unchanged
    assert(extract("&copy; stays") == "&copy; stays")
    // full six-entity set
    assert(extract("&lt;&gt;&quot;&#39;&nbsp;&amp;") == "<>\"' &")
    assert(extract("") == "")
    // null propagates (expression level)
    val r = Seq[Option[String]](Some("<i>t</i>"), None).toDF("h")
      .select(graft.functions.HtmlExtract(col("h")).as("o"))
      .as[Option[String]].collect()
    assert(r.toSeq == Seq(Some("t"), None))
    // composed front-end: markup → normText-clean text
    val n = Seq("<h1> Mixed &amp;  CASE </h1>").toDF("h")
      .select(TextOps.normTextMarkup(col("h")).as("o"))
      .as[String].collect()
    assert(n.head == "mixed & case")
  }

  test("oovRate equals a driver recount under the vocabBuild cut") {
    val toks = TextOps.documents(spark, sfDir)
      .select(col("lang"), TextOps.normText(col("text")).as("norm"))
      .as[(String, String)].collect()
      .flatMap { case (l, n) =>
        n.split(" ").filter(_.nonEmpty).map(t => (l, t)) }
    val freq = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocab = freq.toSeq
      .filter(_._2 >= TextOps.vocabMinFreq)
      .sortBy { case (t, f) => (-f, t) }
      .take(TextOps.oovVocabK).map(_._1).toSet
    val exp = toks.groupBy(_._1).map { case (l, ts) =>
      val n = ts.length.toLong
      val oov = ts.count(t => !vocab.contains(t._2)).toLong
      (l, n, oov, oov.toDouble / n.toDouble)
    }.toSet
    val got = TextOps.oovRate(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == exp)
    // the budget must leave real OOV mass on the fixture or the test is vacuous
    assert(exp.exists(_._3 > 0), "no OOV tokens under the budget")
  }

  test("dataset card matches a driver recompute of every field") {
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "source").as[(Long, String, String)].collect()
    val q = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "n_tokens", "quality_score")
      .as[(Long, Long, Double)].collect()
    val chars = TextOps.documents(spark, sfDir)
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT)")
      .as[(Long, Long)].collect().toMap
    val uniq = TextOps.dedupExact(spark, sfDir).count()
    val sumFp = q.map(r => math.floor(r._3 * 1e6 + 0.5).toLong).sum
    val exp = (docs.length.toLong, docs.map(_._2).distinct.length.toLong,
      docs.map(_._3).distinct.length.toLong,
      docs.map(d => chars(d._1)).sum, q.map(_._2).sum, uniq,
      1.0 - uniq.toDouble / docs.length.toDouble,
      sumFp.toDouble / 1e6 / docs.length.toDouble)
    val got = TextOps.datasetCard(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got == Seq(exp))
  }

  test("freqSpectrum: bands partition the vocabulary, bit-length " +
      "banding, shares conserve") {
    val rows = TextOps.freqSpectrum(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    // brute-force the vocabulary from the fixture
    val tf = TextOps.documents(spark, sfDir)
      .select(explode(split(TextOps.normText(col("text")), " "))
        .as("t")).filter(col("t") =!= "")
      .groupBy("t").count().as[(String, Long)].collect()
    val wantBands = tf.groupBy(r => java.lang.Long.toBinaryString(r._2)
      .length.toLong)
    assert(rows.map(_._1).toSet == wantBands.keySet)
    for ((band, nTypes, nOcc, tShare, oShare) <- rows) {
      val w = wantBands(band)
      assert(nTypes == w.length.toLong, s"band $band types")
      assert(nOcc == w.map(_._2).sum, s"band $band occurrences")
      assert(tShare == nTypes.toDouble / tf.length, s"band $band tshare")
      assert(oShare == nOcc.toDouble / tf.map(_._2).sum, s"band $band oshare")
    }
    // the corpus is word salad over a bounded vocabulary, but the band
    // arithmetic itself must place any freq-1 type in band 1
    assert(rows.map(_._2).sum == tf.length.toLong)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9)
  }

  test("readability ≡ regex recomputation over collected text") {
    val out = TextOps.readability(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = TextOps.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextOps.normText(
          org.apache.spark.sql.functions.col("text")).as("norm"),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, String, String)].collect()
    assert(out.size == docs.length)
    for ((id, norm, text) <- docs) {
      val w = math.max("[a-z0-9]+".r.findAllIn(norm).size, 1)
      val s = math.max("[.!?]+".r.findAllIn(text).size, 1)
      val sy = math.max("[aeiouy]+".r.findAllIn(norm).size, 1)
      val flesch = 206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (sy.toDouble / w.toDouble)
      val row = out(id)
      assert(row._2 == w && row._3 == s && row._4 == sy,
        s"doc $id counts: $row vs ($w, $s, $sy)")
      assert(row._5 == flesch, s"doc $id flesch ${row._5} vs $flesch")
    }
    // a document with more syllables per word must not score higher
    // when words/sentence are equal — sanity of the formula's sign
    assert(out.values.forall(r => r._5 <= 206.835))
  }
}
