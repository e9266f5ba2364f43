package graft.ext

import graft.SparkSpec

/** Error-bound and determinism contracts for the approximate sketches.
  * No cross-engine oracle exists for HLL++/GK by nature, so the
  * correctness statement is: bounded error against the exact twin on the
  * same input, and run-to-run determinism (both sketches are
  * deterministic functions of the input multiset — no RNG).
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 3·rsd of exact per group") {
    val exact = SketchOps.supplierDistinctProductsExact(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val approx = SketchOps.supplierDistinctProductsApprox(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    // HLL++ standard error = rsd; 3 sigma covers ~99.7% of groups —
    // on the fixed fixture this must hold for every group
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k).toDouble - n) / math.max(n, 1L)
      assert(err <= 3 * SketchOps.hllRsd,
        s"supplier $k: exact=$n approx=${approx(k)} relErr=$err")
    }
  }

  test("approx_count_distinct is deterministic across invocations") {
    val a = SketchOps.supplierDistinctProductsApprox(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val b = SketchOps.supplierDistinctProductsApprox(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("percentile_approx rank error is within n/accuracy per group") {
    val approx = SketchOps.groupPercentilesApprox(spark, sfDir)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    // independent exact check: rank of the returned value inside the
    // group's sorted values must be within n/accuracy of the target rank
    val values = EventOps.events(spark, sfDir)
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val qs = Seq(0.5, 0.9, 0.99)
    for ((etype, ps) <- approx; (q, v) <- qs.zip(ps)) {
      val sorted = values(etype)
      val n = sorted.length
      val below = sorted.count(_ <= v)
      val targetRank = q * n
      val slack = n.toDouble / SketchOps.percentileAccuracy + 1
      assert(math.abs(below - targetRank) <= slack,
        s"$etype q=$q v=$v rank=$below target=$targetRank n=$n")
    }
  }

  test("percentile_approx is deterministic across invocations") {
    val run = () => SketchOps.groupPercentilesApprox(spark, sfDir)
      .as[(String, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("count-min estimates are one-sided: never below the true count, " +
      "within eps*N above it") {
    import org.apache.spark.sql.functions._
    // exact per-(lang, token) doc frequencies — the ground truth
    val tok = TextOps.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        explode(array_distinct(
          split(TextOps.normText(col("text")), " "))).as("token"))
      .filter(col("token") =!= "")
    val truth = tok.groupBy("lang", "token").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap

    val sketches = SketchOps.tokenFrequencySketch(spark, sfDir)
      .as[(String, Array[Byte], Long)].collect()
    assert(sketches.map(_._1).toSet == truth.keySet)
    for ((lang, bytes, n) <- sketches) {
      val est = SketchOps.estimateCounts(bytes, truth(lang).keys.toSeq)
      val slack = math.ceil(SketchOps.cmsEps * n).toLong
      truth(lang).foreach { case (t, c) =>
        assert(est(t) >= c, s"$lang/$t: CMS under-counted ${est(t)} < $c")
        assert(est(t) <= c + slack,
          s"$lang/$t: est=${est(t)} true=$c slack=$slack n=$n")
      }
    }
  }

  test("heavyHitters is bit-identical to the exact topTokens") {
    val exact = TextOps.topTokens(spark, sfDir)
      .as[(String, Long, String, Long)].collect().sorted
    val hh = SketchOps.heavyHitters(spark, sfDir)
      .as[(String, Long, String, Long)].collect().sorted
    assert(exact.nonEmpty)
    assert(hh.toSeq == exact.toSeq)
  }

  test("Misra-Gries keeps every key above the n/m undercount bound") {
    // skewed stream: key i has frequency 2^(9-i) for i in 0..9, plus a
    // 500-key noise tail of singletons; n = 1023 + 500
    val heavy = (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"h$i"))
    val noise = (0 until 500).map(i => s"noise$i")
    // deterministic interleave (no RNG: same stream every run)
    val stream = (heavy ++ noise).sortBy(_.hashCode)
    val m = 64
    val n = stream.length
    val survivors = SketchOps.mgKeys(stream.iterator, m).toSet
    assert(survivors.size <= m)
    val truth = stream.groupBy(identity).view.mapValues(_.size).toMap
    truth.filter(_._2 > n / m).keys.foreach { k =>
      assert(survivors.contains(k),
        s"$k freq=${truth(k)} > n/m=${n / m} evicted from MG summary")
    }
  }

  test("register HLL ≡ plain-Scala md5 register recomputation") {
    import org.apache.spark.sql.functions._
    val got = SketchOps.hllRegisters(TextOps.documents(spark, sfDir))
      .as[(String, Int, Int)].collect()
      .map { case (l, i, r) => (l, i) -> r }.toMap
    val grams = TextOps.documents(spark, sfDir)
      .select(col("lang"), explode(array_distinct(CurationOps.grams(
        CurationOps.toksCol, CurationOps.decontGramTokens))).as("gram"))
      .as[(String, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = scala.collection.mutable.Map.empty[(String, Int), Int]
    for ((lang, g) <- grams) {
      md.reset()
      val h = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val idx = Integer.parseInt(h.substring(0, 2), 16)
      val v = java.lang.Long.parseLong(h.substring(2, 12), 16)
      val rank =
        if (v == 0L) SketchOps.hllMaxRank
        else SketchOps.hllMaxRank - java.lang.Long.toBinaryString(v).length
      val k = (lang, idx)
      want(k) = math.max(want.getOrElse(k, 0), rank)
    }
    assert(got == want.toMap,
      s"registers diverge: extra=${got.toSet.diff(want.toSet)} " +
        s"missing=${want.toSet.diff(got.toSet)}")
  }

  test("shard-merged registers ≡ whole-corpus registers, bit for bit") {
    import org.apache.spark.sql.functions._
    val docs = TextOps.documents(spark, sfDir)
    val whole = SketchOps.hllRegisters(docs)
      .as[(String, Int, Int)].collect().toSet
    val merged = (0 until SketchOps.hllShards)
      .map(s => SketchOps.hllRegisters(
        docs.filter(col("doc_id") % SketchOps.hllShards === s)))
      .reduce(_ union _)
      .groupBy("lang", "idx").agg(max("rank").as("rank"))
      .as[(String, Int, Int)].collect().toSet
    assert(merged == whole)
  }

  test("corrected register-HLL estimate within 25% of exact per lang") {
    val rows = SketchOps.hllDistinct(spark, sfDir)
      .select("lang", "n_zero", "est_raw", "exact_distinct")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    for ((lang, nZero, raw, exact) <- rows) {
      // the standard small-range correction (linear counting) uses ln,
      // whose last-ulp behavior is libm-specific — applied HERE, not in
      // the oracle-gated output
      val m = SketchOps.hllRegM.toDouble
      val corrected =
        if (raw <= 2.5 * m && nZero > 0) m * math.log(m / nZero)
        else raw
      val relErr = math.abs(corrected - exact) / exact
      assert(relErr < 0.25,
        s"$lang: corrected=$corrected exact=$exact relErr=$relErr")
    }
  }

  test("HDR quantile sketch ≡ recomputation; bucket-width error bound; " +
      "shard-merge ≡ whole") {
    val out = SketchOps.hdrQuantiles(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(out.nonEmpty)

    // independent recomputation from collected values
    val vals = EventOps.events(spark, sfDir)
      .select("event_type", "value")
      .as[(String, Double)].collect()
    val m = SketchOps.hdrMantissaBits
    def bucketLb(v: Double): Long = {
      val q = math.floor(v * SketchOps.hdrScale).toLong
      val sh = math.max(64 - java.lang.Long.numberOfLeadingZeros(q)
        - 1 - m, 0)
      (q >> sh) << sh
    }
    val want = vals.groupBy(_._1).flatMap { case (typ, vs) =>
      val buckets = vs.map(v => bucketLb(v._2))
        .groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = vs.size.toLong
      val nb = buckets.size.toLong
      SketchOps.hdrPhis.map { phi =>
        var cum = 0L
        val lb = buckets.find { case (_, c) =>
          cum += c; cum * 100 >= phi * n
        }.get._1
        val sh = math.max(64 - java.lang.Long.numberOfLeadingZeros(lb)
          - 1 - m, 0)
        val est = (2 * lb + (1L << sh) - 1).toDouble /
          (2 * SketchOps.hdrScale).toDouble
        (typ, phi, n, nb, est)
      }
    }.toSet
    assert(out == want,
      s"extra=${out.diff(want)} missing=${want.diff(out)}")

    // the estimate brackets the EXACT lower quantile within the bucket
    // width: relative error ≤ 2^-(m+1) plus the half-cent quantization
    val exactQ = vals.groupBy(_._1).view.mapValues { vs =>
      val sorted = vs.map(_._2).sorted
      SketchOps.hdrPhis.map { phi =>
        val r = math.ceil(phi * sorted.length / 100.0).toInt
        phi -> sorted(math.max(r - 1, 0))
      }.toMap
    }.toMap
    for ((typ, phi, _, _, est) <- out) {
      val ex = exactQ(typ)(phi)
      val bound = ex / math.pow(2.0, (m + 1).toDouble) + 0.01
      assert(math.abs(est - ex) <= bound,
        s"$typ p$phi: est=$est exact=$ex bound=$bound")
    }

    // merge law: four doc-shard sketches, merged, identical rows
    val merged = SketchOps.hdrQuantilesMerged(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(merged == out)
  }

  test("hdrFold: fold ≡ re-sketch on union; restart reads; chain " +
      "breaks loudly; gc retires") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = SketchOps.hdrBaseDir(sfDir)
    val tag = "spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"${base}__feed_$tag"))

    val e = EventOps.events(spark, sfDir)
    def batch(k: Int) = e.filter(col("event_id") % 2 === k)
      .select(col("event_type"),
        (col("value") * lit((k + 3).toDouble)).as("value"))

    val r0 = SketchOps.hdrFold(spark, sfDir, tag, batch(0), 0L).collect()
    val r1 = SketchOps.hdrFold(spark, sfDir, tag, batch(1), 1L).collect()
    assert(r0.nonEmpty && r1.nonEmpty)

    // fold ≡ from-scratch sketch of corpus ∪ b0 ∪ b1, bucket for bucket
    val gen1 = spark.read.parquet(s"${base}__feed_$tag/g1")
      .as[(String, Long, Long)].collect().toSet
    val union = e.select(col("event_type"), col("value"))
      .unionByName(batch(0)).unionByName(batch(1))
    val want = SketchOps.hdrBuckets(union)
      .as[(String, Long, Long)].collect().toSet
    assert(gen1 == want, "fold diverged from re-sketch")

    // restart reads the SUCCESS-gated generation; output identical
    val r1b = SketchOps.hdrFold(spark, sfDir, tag, batch(1), 1L).collect()
    assert(r1b.toSeq == r1.toSeq)

    intercept[IllegalArgumentException] {
      SketchOps.hdrFold(spark, sfDir, tag, batch(0), 3L)
    }

    val retired = SketchOps.hdrGc(sfDir, tag, 1)
    assert(retired == Seq(0L), s"retired $retired")
    val r2 = SketchOps.hdrFold(spark, sfDir, tag, batch(0), 2L).collect()
    assert(r2.nonEmpty)
    rm(new java.io.File(s"${base}__feed_$tag"))
  }

  test("hdrDrift ≡ TVD recomputation; bounds hold; every day present") {
    val out = SketchOps.hdrDrift(spark, sfDir)
      .as[(String, Long, Double)].collect()
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 1.0),
      "TVD out of [0,1]")

    import org.apache.spark.sql.functions.{col, date_format}
    val rows = EventOps.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value"))
      .as[(String, Double)].collect()
    val m = SketchOps.hdrMantissaBits
    def lb(v: Double): Long = {
      val q = math.floor(v * SketchOps.hdrScale).toLong
      val sh = math.max(64 - java.lang.Long.numberOfLeadingZeros(q)
        - 1 - m, 0)
      (q >> sh) << sh
    }
    val all = rows.map(r => lb(r._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.length.toLong
    val want = rows.groupBy(_._1).map { case (day, vs) =>
      val db = vs.map(v => lb(v._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nd = vs.size.toLong
      val s = all.map { case (b, c) =>
        (BigInt(db.getOrElse(b, 0L)) * n - BigInt(c) * nd).abs
      }.sum
      (day, nd,
        s.toDouble / (BigInt(2) * nd * n).toDouble)
    }.toSet
    assert(out.toSet == want,
      s"extra=${out.toSet.diff(want).take(3)} " +
        s"missing=${want.diff(out.toSet).take(3)}")
    assert(out.length == rows.map(_._1).distinct.length)
  }
}
