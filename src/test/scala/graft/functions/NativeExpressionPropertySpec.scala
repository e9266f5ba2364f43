package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.ext.DedupOps

/** Property tests: every native codegen expression must agree with its
  * composed-builtins reference on ARBITRARY inputs, not just fixtures.
  * Generators stay in printable ASCII + space — the parity contract of
  * the twin hash family (DuckDB `ord` vs Spark `ascii` agree there, and
  * Java's split("") separates surrogate pairs outside the BMP anyway).
  * Cases are drawn from SEEDED ScalaCheck generators (the offline cache
  * has no scalatest bridge; seeding keeps failures reproducible).
  */
class NativeExpressionPropertySpec extends SparkSpec {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(33.toChar, 126.toChar),
      2 -> Gen.const(' '))).map(_.mkString)

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("ShingleHashes(distinct) == distinct polyHash62 of string shingles") {
    import spark.implicits._
    for (texts <- cases(Gen.listOfN(8, asciiText), 15)) {
      val df = texts.toDF("norm")
      val native = df.select(
        ShingleHashes(col("norm"), DedupOps.shingleLen, distinct = true)
          .as("sh")).as[Seq[Long]].collect().map(_.toSet).toSeq
      val composed = df.select(
        DedupOps.hashedShinglesOfNorm(col("norm")).as("sh"))
        .as[Seq[Long]].collect().map(_.toSet).toSeq
      assert(native == composed, s"diverged on $texts")
    }
  }

  test("SimHash64 == composed vote fold on arbitrary token streams") {
    import spark.implicits._
    for (texts <- cases(Gen.listOfN(6, asciiText), 15)) {
      val df = texts.toDF("text")
        .withColumn("toks", split(col("text"), " "))
      val native = df.select(SimHash64(col("toks")).as("h"))
        .as[Long].collect().toSeq
      val composed = df
        .withColumn("votes", DedupOps.simhashVotes(col("toks")))
        .select(DedupOps.simhashFromVotes(col("votes")).as("h"))
        .as[Long].collect().toSeq
      assert(native == composed, s"diverged on $texts")
    }
  }

  test("SortedIntersectCount == size(array_intersect) on sorted sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, size => asize}
    val setGen = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    for (pairs <- cases(Gen.listOfN(6, Gen.zip(setGen, setGen)), 15)) {
      val df = pairs.toDF("a", "b")
      val native = df.select(
        SortedIntersectCount(col("a"), col("b")).as("c"))
        .as[Long].collect().toSeq
      val builtin = df.select(
        asize(array_intersect(col("a"), col("b"))).cast("long").as("c"))
        .as[Long].collect().toSeq
      assert(native == builtin, s"diverged on $pairs")
    }
  }

  test("SortedIntersectCount fails loudly on unsorted input") {
    import spark.implicits._
    // wrapper type depends on where evaluation happens (task vs local
    // relation) — the contract is the message, not the wrapper
    val e = intercept[Throwable] {
      Seq((Seq(3L, 1L, 2L), Seq(1L, 2L))).toDF("a", "b")
        .select(SortedIntersectCount(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not sorted")), e.toString)
  }

  test("SortedIntersectCount rejects duplicate elements (set contract)") {
    import spark.implicits._
    // duplicates would be counted with multiplicity, silently diverging
    // from size(array_intersect) set semantics — the guard must fire
    val e = intercept[Throwable] {
      Seq((Seq(1L, 2L, 2L, 3L), Seq(2L, 3L))).toDF("a", "b")
        .select(SortedIntersectCount(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not sorted")), e.toString)
  }

  test("null array elements: minhash/hyperplane skip, intersect rejects") {
    import spark.implicits._
    val withNull = Seq(Seq[java.lang.Long](5L, null, 9L)).toDF("sh")
    val without = Seq(Seq[java.lang.Long](5L, 9L)).toDF("sh")
    val sigOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(MinHashSignature(col("sh")).as("sig"))
        .as[Seq[Long]].collect().head
    assert(sigOf(withNull) == sigOf(without),
      "null element must be treated as absent from the set")

    val vNull = Seq(Seq[java.lang.Double](0.5, null, -0.25)).toDF("v")
    val vZero = Seq(Seq[java.lang.Double](0.5, 0.0, -0.25)).toDF("v")
    val bOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(HyperplaneBuckets(col("v")).as("b"))
        .as[Seq[Int]].collect().head
    assert(bOf(vNull) == bOf(vZero),
      "null element must contribute 0 to the projection")

    val e = intercept[Throwable] {
      Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L)))
        .toDF("a", "b")
        .select(SortedIntersectCount(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null element")), e.toString)
  }

  test("HyperplaneBuckets matches an independent scalar model") {
    import spark.implicits._
    import HyperplaneBuckets.{A, B, P, bitsPerBand, nBands, numBits}
    def model(v: Seq[Double]): Seq[Int] = {
      val out = Array.fill(nBands)(0)
      for (j <- 0 until numBits) {
        var acc = 0.0
        for (i <- v.indices) {
          val t = j.toLong * v.length + i + 1
          acc += v(i) * (((A * t + B) % P).toDouble / P - 0.5)
        }
        if (acc >= 0.0) out(j / bitsPerBand) |= 1 << (j % bitsPerBand)
      }
      out.toSeq
    }
    val vecGen = Gen.listOfN(16, Gen.choose(-1.0, 1.0))
    for (vecs <- cases(Gen.listOfN(4, vecGen), 10)) {
      val native = vecs.map(_.toArray).toDF("v")
        .select(HyperplaneBuckets(col("v")).as("b"))
        .as[Seq[Int]].collect().toSeq
      assert(native == vecs.map(model), s"diverged on $vecs")
    }
  }

  test("UnigramViterbi == driver DP on arbitrary words and cost tables") {
    import spark.implicits._
    // mirror of the expression's contract: lexicographic
    // (cost, pieces, start) minimum over in-vocab covers, [UNK] on an
    // unreachable cell, [] on the empty word
    def ref(w: String, costs: Map[String, Long]): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      val maxLen = if (costs.isEmpty) 0 else costs.keys.map(_.length).max
      val inf = Long.MaxValue
      val v = Array.fill(w.length + 1)(inf); v(0) = 0L
      val n = new Array[Int](w.length + 1)
      val ptr = new Array[Int](w.length + 1)
      for (pos <- 1 to w.length;
           j <- math.max(0, pos - maxLen) until pos if v(j) != inf)
        costs.get(w.substring(j, pos)).foreach { c =>
          val cv = v(j) + c; val cn = n(j) + 1
          if (cv < v(pos) || (cv == v(pos) && cn < n(pos))) {
            v(pos) = cv; n(pos) = cn; ptr(pos) = j
          }
        }
      if (v(w.length) == inf) return Seq(WordPieceGreedy.defaultUnk)
      var acc = List.empty[String]; var pos = w.length
      while (pos > 0) { acc ::= w.substring(ptr(pos), pos); pos = ptr(pos) }
      acc
    }
    val word: Gen[String] =
      Gen.listOf(Gen.choose('a', 'e')).map(_.take(10).mkString)
    val piece: Gen[(String, Long)] = for {
      len <- Gen.choose(2, 5)
      cs <- Gen.listOfN(len, Gen.choose('a', 'e'))
      cost <- Gen.choose(1L, 60L)
    } yield (cs.mkString, cost)
    val modelGen: Gen[Seq[(String, Long)]] = for {
      multis <- Gen.listOfN(12, piece)
      // only SOME single chars: uncoverable words exercise [UNK]
      charCosts <- Gen.listOfN(4, Gen.choose(1L, 99L))
    } yield "abcd".zip(charCosts).map { case (c, x) => (c.toString, x) } ++
      multis.distinctBy(_._1)
    for (i <- 0 until 12) {
      val model = cases(modelGen, 1 + i).last
      val words = cases(Gen.listOfN(10, word), 20 + i).last.distinct
      val costs = model.toMap
      val native = words.toDF("w")
        .select(col("w"), UnigramViterbi(col("w"), model).as("pcs"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      for (w <- words)
        assert(native(w) == ref(w, costs),
          s"diverged on '$w' under $model: ${native(w)} vs ${ref(w, costs)}")
    }
  }

  test("AudioFp64 == BigInt band-energy model on arbitrary payloads") {
    import spark.implicits._
    import graft.functions.AudioFp64.{bands, frames}
    // arbitrary byte payloads incl. high bytes (the expression reads
    // raw bytes, not text — no ASCII restriction here)
    val bytesGen: Gen[Array[Byte]] =
      Gen.choose(1, 300).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray))
    def model(bytes: Array[Byte]): Long = {
      def energy(f: Int, b: Int): BigInt =
        bytes.indices.filter(i => i.toLong * frames / bytes.length == f)
          .map(i => BigInt(bytes(i) & 0xff) *
            (if (((i >> b) & 1) == 0) 1 else -1)).sum
      var sig = 0L
      for (f <- 0 until frames; b <- 0 until bands - 1)
        if (energy(f, b + 1).abs > energy(f, b).abs)
          sig |= 1L << (f * (bands - 1) + b)
      sig
    }
    for (payloads <- cases(Gen.listOfN(6, bytesGen), 12)) {
      val df = payloads.map(b => Tuple1(b)).toDF("p")
      val native = df.select(AudioFp64(col("p")).as("h"))
        .as[Long].collect().toSeq
      assert(native == payloads.map(model),
        s"diverged on ${payloads.map(_.toSeq)}")
    }
  }

  test("Md5Bucket == the composed hex-digit formula the oracle runs") {
    import spark.implicits._
    val B = graft.ext.SampleOps.dsirBuckets
    for (texts <- cases(Gen.listOfN(12, asciiText), 15)) {
      // include multi-byte UTF-8 alongside the generated ASCII: the
      // digest runs over the same UTF-8 bytes in both forms
      val df = (texts ++ Seq("héllo wörld", "日本語", "")).toDF("g")
      val native = df.select(Md5Bucket(col("g"), B).as("b"))
        .as[Long].collect().toSeq
      val composed = df.select(
        expr(graft.ext.SampleOps.dsirBucketSql("g")).cast("long").as("b"))
        .as[Long].collect().toSeq
      assert(native == composed, s"diverged on $texts")
      assert(native.forall(b => b >= 0 && b < B))
    }
  }
}
