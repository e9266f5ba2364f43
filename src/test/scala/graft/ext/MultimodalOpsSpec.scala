package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("imageNearDup equals a driver-side brute force over model hashes") {
    // independent model: recompute every payload's percentile-grid dHash
    // from raw bytes (full sort, not the counting-sort implementation),
    // then all-pairs Hamming — the op with the bucket cap OFF must find
    // exactly the pairs at distance <= simhashMaxHamming (pigeonhole:
    // <= 8 differing bits leave >= 1 of 9 chunks agreeing)
    def model(bytes: Array[Byte]): Long = {
      val S = graft.functions.ImageHash64.samples
      val srt = bytes.map(_ & 0xff).sorted
      val v = (0 until S).map(k => srt((k.toLong * srt.length / S).toInt))
      var sig = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (v(r * 9 + c + 1) > v(r * 9 + c)) sig |= 1L << (r * 8 + c)
      sig
    }
    val raw = graft.io.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2.getBytes("UTF-8").nonEmpty)
    val hashes = raw.map { case (id, t) => id -> model(t.getBytes("UTF-8")) }
    // the native expression agrees with the model hash bit-for-bit
    val got = MultimodalOps.imageHashes(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == hashes.toMap, "native ImageHash64 diverges from model")
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= DedupOps.simhashMaxHamming
    } yield (a, b, d.toLong)).toSet
    val pairs = MultimodalOps.imageNearDup(spark, sfDir,
        maxChunkBucket = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == expected,
      s"missing=${(expected -- pairs).take(5)} extra=${(pairs -- expected).take(5)}")
    assert(pairs.nonEmpty, "fixture produced no near-dup images")
    // plan shape: banded self-join, never a nested-loop/cartesian pairing
    val p = MultimodalOps.imageNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      "image near-dup degenerated into an all-pairs join:\n" + p.take(1500))
  }

  test("audioNearDup equals a driver-side brute force over model prints") {
    // independent model of the Walsh band fingerprint: per-(frame,
    // band) signed sums computed with BigInt folds, then the 64
    // band-difference comparisons — not the array-walk implementation
    def model(bytes: Array[Byte]): Long = {
      import graft.functions.AudioFp64.{bands, frames}
      val idx = bytes.indices
      def energy(f: Int, b: Int): BigInt =
        idx.filter(i => i.toLong * frames / bytes.length == f)
          .map(i => BigInt(bytes(i) & 0xff) *
            (if (((i >> b) & 1) == 0) 1 else -1))
          .sum
      var sig = 0L
      for (f <- 0 until frames; b <- 0 until bands - 1)
        if (energy(f, b + 1).abs > energy(f, b).abs)
          sig |= 1L << (f * (bands - 1) + b)
      sig
    }
    val raw = graft.io.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2.getBytes("UTF-8").nonEmpty)
    val prints = raw.map { case (id, t) => id -> model(t.getBytes("UTF-8")) }
    val got = MultimodalOps.audioFingerprints(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == prints.toMap, "native AudioFp64 diverges from model")
    val expected = (for {
      (a, ha) <- prints; (b, hb) <- prints if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= DedupOps.simhashMaxHamming
    } yield (a, b, d.toLong)).toSet
    val pairs = MultimodalOps.audioNearDup(spark, sfDir,
        maxChunkBucket = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == expected,
      s"missing=${(expected -- pairs).take(5)} extra=${(pairs -- expected).take(5)}")
    val p = MultimodalOps.audioNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      "audio near-dup degenerated into an all-pairs join:\n" + p.take(1500))
  }

  test("audioRecall: pigeonhole 100% with cap off; cap=1 sinks it") {
    import org.apache.spark.sql.functions.col
    // cap wide open: <= 8 differing bits leave >= 1 of 9 chunks
    // agreeing, so the banding finds EVERY exact pair — recall 1.0
    val open = MultimodalOps.audioRecall(spark, sfDir,
        bucketCap = Int.MaxValue)
      .as[(Long, Long, Long, Double)].head()
    assert(open._1 > 0L, "sample holds no exact pairs — vacuous")
    assert(open._2 == open._1 && open._3 == open._1 && open._4 == 1.0,
      s"cap-off recall must be exactly 1.0: $open")
    // cap = 1: every bucket holding a pair needs size >= 2, so every
    // pairing bucket is dropped — recall 0 by construction
    val sunk = MultimodalOps.audioRecall(spark, sfDir, bucketCap = 1)
      .as[(Long, Long, Long, Double)].head()
    assert(sunk._2 == 0L && sunk._4 == 0.0,
      s"cap=1 must drop every pair: $sunk")
    // the default cap sits between the extremes and the telemetry
    // reports whatever it costs — banded pairs are always a subset of
    // the exact pairs (the verify filter), never an overcount
    val dflt = MultimodalOps.audioRecall(spark, sfDir)
      .as[(Long, Long, Long, Double)].head()
    assert(dflt._2 == dflt._3 && dflt._2 <= dflt._1, dflt.toString)
  }

  test("AudioFp64 separates clones-with-noise from unrelated payloads") {
    // a near-clone (a few byte-level edits of the same 'signal') must
    // land within the verify threshold; unrelated noise must not
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(4096)(i =>
      (128 + 90 * math.sin(i / 17.0) + 30 * math.sin(i / 3.0)).toByte)
    val clone = base.clone()
    for (_ <- 0 until 40) {
      val i = rnd.nextInt(base.length)
      clone(i) = (clone(i) + rnd.nextInt(9) - 4).toByte
    }
    val other = Array.tabulate(4096)(_ => rnd.nextInt(256).toByte)
    def fp(b: Array[Byte]) = graft.functions.AudioFp64.hash(b)
    val dClone = java.lang.Long.bitCount(fp(base) ^ fp(clone))
    val dOther = java.lang.Long.bitCount(fp(base) ^ fp(other))
    assert(dClone <= DedupOps.simhashMaxHamming,
      s"clone drifted $dClone bits — fingerprint too brittle")
    assert(dOther > DedupOps.simhashMaxHamming,
      s"unrelated payload only $dOther bits away — fingerprint too lax")
  }

  test("decodeStub: per-partition batched decode emits typed metadata") {
    val payload1 = "hello world, a binary payload stand-in"
    val payloads = Seq((1L, payload1), (2L, "x")).toDF("doc_id", "text")
      .withColumn("content", col("text").cast("binary"))
    val metas = MultimodalOps.decodeStub(spark, payloads)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).n_bytes == payload1.length.toLong)
    assert(metas(1L).width == ('h'.toInt % 64 + 1).toLong)
    assert(metas(1L).height == ('h'.toInt % 48 + 1).toLong)
    assert(metas(1L).n_frames == payload1.length.toLong / 16)
    assert(metas(2L).n_frames == 0L && metas(2L).sampled_frames.isEmpty)
  }

  test("frame sampling picks every Nth frame index") {
    val payloads = Seq((1L, "a" * 400)).toDF("doc_id", "text")
      .withColumn("content", col("text").cast("binary"))
    val m = MultimodalOps.decodeStub(spark, payloads, frameSampleEvery = 7)
      .collect().head
    assert(m.n_frames == 25L)
    assert(m.sampled_frames == Seq(0L, 7L, 14L, 21L))
  }

  test("frameSamples fingerprints the exact byte slice at each offset") {
    val r = MultimodalOps.frameSamples(spark, sfDir)
    val d = graft.io.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // recompute one sampled frame's md5 from the raw text bytes and match
    val checked = r.join(d, "doc_id")
      .withColumn("expect_md5",
        md5(lower(hex(col("text").cast("binary")
          .substr(col("frame_off").cast("int") + 1,
            lit(MultimodalOps.frameBytes))))))
    assert(checked.filter(col("frame_md5") =!= col("expect_md5")).count() == 0)
    // sampled indices align with the decode seam's arithmetic
    val viaStub = MultimodalOps.decodeStub(spark,
        d.withColumn("content", col("text").cast("binary")))
      .flatMap(m => m.sampled_frames.map(f => (m.doc_id, f)))
      .collect().toSet
    val viaSql = r.select("doc_id", "frame_idx")
      .as[(Long, Long)].collect().toSet
    assert(viaSql == viaStub)
  }

  test("binaryMeta is deterministic and byte-accurate on the fixture") {
    val m = MultimodalOps.binaryMeta(spark, sfDir)
    val d = graft.io.Tables.load(spark, sfDir, "documents")
    assert(m.count() == d.count())
    val bad = m.join(d, "doc_id")
      .filter(col("n_bytes") =!= length(col("text").cast("binary"))).count()
    assert(bad == 0)
  }

  test("videoNearDup equals a brute-force shared-frame recount") {
    import spark.implicits._
    val frames = MultimodalOps.frameSamples(spark, sfDir)
      .select("doc_id", "frame_md5").distinct()
      .as[(Long, String)].collect()
    val byDoc = frames.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hashFreq = frames.groupBy(_._2).view.mapValues(_.length)
    val keptByDoc = byDoc.mapValues(
      _.filter(hashFreq(_) <= MultimodalOps.videoFrameBucketCap)).toMap
    val ids = byDoc.keys.toSeq.sorted
    val exp = (for {
      a <- ids; b <- ids if a < b
      shared = (keptByDoc(a) & keptByDoc(b)).size
      if shared >= MultimodalOps.videoSharedFramesMin
    } yield (a, b) -> (shared.toLong,
      shared.toDouble / math.min(byDoc(a).size, byDoc(b).size))).toMap
    val got = MultimodalOps.videoNearDup(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, s, o) => (a, b) -> (s, o) }.toMap
    assert(got == exp, s"pair sets differ: got=${got.size} exp=${exp.size}")
  }
}
