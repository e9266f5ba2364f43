package graft.ext

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Instrumented models live OUTSIDE the suite class: a nested object
  * would capture the suite instance in its serialized closure (Task not
  * serializable). Top-level Scala objects serialize as module refs and
  * resolve back to the singleton, so the static counters observe the
  * executor-side calls in single-JVM local mode.
  */
object ScoringProbeModel extends ScoringOps.BatchModel[Long, Long] {
  val name = "probe"
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def reset(): Unit = { opens.set(0); closes.set(0); batchSizes.clear() }
  def open(): ScoringOps.BatchHandle[Long, Long] = {
    opens.incrementAndGet()
    new ScoringOps.BatchHandle[Long, Long] {
      def scoreBatch(batch: Seq[Long]): Seq[Long] = {
        ScoringProbeModel.batchSizes.add(batch.length)
        batch.map(_ * 10L)
      }
      def close(): Unit = { ScoringProbeModel.closes.incrementAndGet(); () }
    }
  }
}

/** Returns one fewer output than inputs — must trip the arity guard. */
object ScoringBrokenModel extends ScoringOps.BatchModel[Long, Long] {
  val name = "broken"
  def open(): ScoringOps.BatchHandle[Long, Long] =
    new ScoringOps.BatchHandle[Long, Long] {
      def scoreBatch(batch: Seq[Long]): Seq[Long] = batch.tail
      def close(): Unit = ()
    }
}

/** Pins every clause of the ScoringOps.batchScore contract: batch
  * shape, lazy init-once-per-non-empty-partition, close-per-open,
  * order/arity preservation, and the stub scorer's closed form.
  */
class ScoringOpsSpec extends SparkSpec {
  import spark.implicits._

  test("batches are bounded and order/arity are preserved") {
    ScoringProbeModel.reset()
    val ds = spark.range(0, 10, 1, 1).as[Long] // one partition, no shuffle
    val out = ScoringOps.batchScore(ds, ScoringProbeModel, batchSize = 4)
      .collect()
    // order + arity: one output per input, in input order
    assert(out.toSeq == (0L until 10L).map(_ * 10L))
    // batch shape: full batches then the remainder, never more than 4
    assert(ScoringProbeModel.batchSizes.asScala.toSeq == Seq(4, 4, 2))
  }

  test("init runs lazily, once per NON-EMPTY partition; close once per open") {
    ScoringProbeModel.reset()
    // 3 rows spread over 8 partitions: most partitions are empty
    val ds = Seq(1L, 2L, 3L).toDS().repartition(8)
    val nonEmpty = ds.mapPartitions(it => Iterator.single(it.nonEmpty))
      .collect().count(identity)
    ScoringOps.batchScore(ds, ScoringProbeModel, batchSize = 2).collect()
    assert(ScoringProbeModel.opens.get() == nonEmpty,
      "open() must not run on empty partitions")
    assert(ScoringProbeModel.closes.get() == ScoringProbeModel.opens.get(),
      "every open must close exactly once")
  }

  test("a model violating one-output-per-input fails loudly") {
    val ds = spark.range(0, 5, 1, 1).as[Long]
    val e = intercept[org.apache.spark.SparkException] {
      ScoringOps.batchScore(ds, ScoringBrokenModel, batchSize = 5).collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("one per input")) ||
        mentions(t.getCause))
    assert(mentions(e), s"unexpected failure: $e")
  }

  test("q_model_score equals a driver-side recompute of the stub") {
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val exp = docs.map { case (id, text) =>
      val norm = text.replaceAll("\\s+", " ").trim
        .toLowerCase(java.util.Locale.ROOT)
      val m = java.util.regex.Pattern.compile("[a-z0-9]+").matcher(norm)
      var nTok = 0L
      while (m.find()) nTok += 1
      val raw = 3L * math.min(norm.length.toLong, ScoringOps.stubLenCap) +
        5L * math.min(nTok, ScoringOps.stubTokCap) +
        2L * (norm.length.toLong % 7L)
      (id, raw, raw.toDouble / (raw + 1000L).toDouble)
    }.toSet
    val got = ScoringOps.modelScore(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("rerank permutes the BM25 shortlist by model score, per lang") {
    val top = TextOps.bm25(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
      .map { case (lang, rank, id, _) => (lang, id) -> rank }.toMap
    val scores = ScoringOps.modelScore(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map { case (id, _, s) => id -> s }.toMap
    val got = ScoringOps.rerank(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    // same (lang, doc) set as the shortlist; bm25_rank carried faithfully
    assert(got.map(r => (r._1, r._3)).toSet == top.keySet)
    got.foreach { case (lang, _, id, bmRank, ms) =>
      assert(top((lang, id)) == bmRank)
      assert(ms == scores(id), s"doc $id")
    }
    // rerank is the (model_score desc, doc_id asc) permutation of 1..n
    got.groupBy(_._1).foreach { case (lang, rs) =>
      val expOrder = rs.sortBy(r => (-r._5, r._3)).map(_._3).toSeq
      val gotOrder = rs.sortBy(_._2).map(_._3).toSeq
      assert(gotOrder == expOrder, lang)
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, lang)
    }
  }

  test("retrievalEval equals a driver recompute of nDCG/MRR from the " +
      "public rankings and independently derived relevance labels") {
    // driver-side relevance: tokenize with the shared rule, take each
    // lang's two top-df tokens (df desc, token asc — the bm25 query),
    // grade docs by how many they contain
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val docToks = docs.map { case (id, lang, text) =>
      val norm = text.replaceAll("\\s+", " ").trim
        .toLowerCase(java.util.Locale.ROOT)
      (id, lang, norm.split(" ").filter(_.nonEmpty).toSet)
    }
    val terms: Map[String, Seq[String]] = docToks.groupBy(_._2)
      .view.mapValues { ds =>
        ds.flatMap(_._3.map(t => t -> 1)).groupBy(_._1)
          .view.mapValues(_.size).toSeq
          .sortBy { case (t, df) => (-df, t) }.take(2).map(_._1)
      }.toMap
    val rel: Map[(String, Long), Long] = docToks.map {
      case (id, lang, toks) =>
        (lang, id) -> terms(lang).count(toks.contains).toLong
    }.filter(_._2 > 0).toMap

    // the three ranked lists, via the PUBLIC operators
    val lists: Seq[(String, String, Long, Long)] =
      TextOps.bm25(spark, sfDir).as[(String, Long, Long, Double)]
        .collect().toSeq
        .map { case (lang, rank, id, _) => ("bm25", lang, rank, id) } ++
      ScoringOps.rerank(spark, sfDir)
        .as[(String, Long, Long, Long, Double)].collect().toSeq
        .map { case (lang, rr, id, _, _) => ("rerank", lang, rr, id) } ++
      TextOps.rrfFusion(spark, sfDir).as[(String, Long, Long, Double)]
        .collect().toSeq
        .map { case (lang, rank, id, _) => ("rrf", lang, rank, id) }

    val disc = ScoringOps.ndcgDiscFp.map { case (r, d) => r.toLong -> d }
      .toMap
    val k = TextOps.bm25TopK
    def gain(r: Long): Long = if (r == 2) 3L else if (r == 1) 1L else 0L
    val idcg: Map[String, Long] = rel.toSeq
      .map { case ((lang, id), r) => (lang, id, r) }.groupBy(_._1)
      .view.mapValues { ds =>
        ds.sortBy(d => (-d._3, d._2)).take(k).zipWithIndex
          .map { case ((_, _, r), i) => gain(r) * disc(i + 1L) }.sum
      }.toMap
    val expected = lists.groupBy(l => (l._1, l._2)).map {
      case ((sys, lang), rows) =>
        val graded = rows.map(r => (r._3, rel.getOrElse((lang, r._4), 0L)))
        val dcg = graded.map { case (rk, r) => gain(r) * disc(rk) }.sum
        val fr = graded.filter(_._2 > 0).map(_._1).sorted.headOption
        (sys, lang,
          graded.count(_._2 > 0).toLong,
          fr.getOrElse(0L),
          dcg.toDouble / idcg(lang).toDouble,
          fr.fold(0.0)(f =>
            (ScoringOps.ndcgScale / f).toDouble /
              ScoringOps.ndcgScale.toDouble))
    }.toSet

    val got = ScoringOps.retrievalEval(spark, sfDir)
      .as[(String, String, Long, Long, Double, Double)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // structural invariants: one row per (system, lang); bm25's top doc
    // always contains a query term (its score is positive), so its MRR
    // is exactly 1; every nDCG is in (0, 1]
    assert(got.map(r => (r._1, r._2)).size == got.size)
    got.filter(_._1 == "bm25").foreach { r =>
      assert(r._4 == 1L && r._6 == 1.0, r.toString)
    }
    got.foreach(r => assert(r._5 > 0.0 && r._5 <= 1.0, r.toString))
  }

  test("hybridSearch: dense arm is cosine-vs-top-BM25-doc, fusion is " +
      "exact RRF of the two arms") {
    import org.apache.spark.sql.functions._
    val (bmTop, _, tf, dl) = TextOps.bm25Top(spark, sfDir)
    val bm = bmTop.select("lang", "doc_id", "rank")
      .as[(String, Long, Int)].collect()
    tf.unpersist(false); dl.unpersist(false)
    val docLang = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val vecs = ext0Embeddings()
    // brute-force dense arm per lang
    val q1 = bm.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val dense = q1.flatMap { case (lang, qd) =>
      val qv = vecs(qd)
      vecs.toSeq
        .filter { case (id, _) => docLang(id) == lang && id != qd }
        .map { case (id, v) => (lang, id, cos(qv, v)) }
        .sortBy(r => (-r._3, r._2))
        .take(TextOps.bm25TopK)
        .zipWithIndex.map { case ((l, id, _), i) => (l, id) -> (i + 1) }
    }
    // brute-force fusion
    def rr(r: Option[Int]): Double =
      r.fold(0.0)(x => 1.0 / (TextOps.rrfK.toDouble + x.toDouble))
    val bmMap = bm.map(r => (r._1, r._2) -> r._3).toMap
    val keys = bmMap.keySet ++ dense.keySet
    val expect = keys.groupBy(_._1).flatMap { case (lang, ks) =>
      ks.toSeq.map { k =>
        (k._1, k._2, rr(bmMap.get(k)) + rr(dense.get(k)))
      }.sortBy(r => (-r._3, r._2))
        .take(TextOps.rrfTopK)
        .zipWithIndex.map { case ((l, id, s), i) => (l, i + 1L, id, s) }
    }.toSet
    val got = ScoringOps.hybridSearch(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    // the fused list actually mixes arms on the fixture: some doc in
    // the hybrid top-k is absent from the BM25 top-k
    assert(got.exists(r => !bmMap.contains((r._1, r._3))),
      "dense arm never contributed")
  }

  private def ext0Embeddings(): Map[Long, Array[Double]] = {
    import org.apache.spark.sql.functions._
    VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])].collect().toMap
  }
  test("mmrRerank equals an independent greedy over the hybrid pool " +
      "and actually reorders it") {
    import org.apache.spark.sql.functions._
    val hybrid = ScoringOps.hybridSearch(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    val pool = hybrid.groupBy(_._1).map { case (l, rs) =>
      l -> rs.sortBy(_._2).map(_._3).toSeq
    }
    val vecs = ext0Embeddings()
    val (bmTop, _, tf, dl) = TextOps.bm25Top(spark, sfDir)
    val q1 = bmTop.filter(col("rank") === 1)
      .select("lang", "doc_id").as[(String, Long)].collect().toMap
    tf.unpersist(false); dl.unpersist(false)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = pool.flatMap { case (lang, ids) =>
      val qvec = vecs(q1(lang))
      val rel = ids.map(id => id -> cos(qvec, vecs(id))).toMap
      var remaining = ids.toSet
      var selected = Vector.empty[Long]
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Double)]
      while (remaining.nonEmpty && selected.size < TextOps.rrfTopK) {
        val scoredC = remaining.toSeq.map { c =>
          val msim = if (selected.isEmpty) 0.0
            else selected.map(sid => cos(vecs(c), vecs(sid))).max
          (c, 0.7 * rel(c) - 0.3 * msim)
        }
        val (pick, score) = scoredC.minBy { case (c, m) => (-m, c) }
        selected :+= pick; remaining -= pick
        picks += ((lang, selected.size.toLong, pick, score))
      }
      picks
    }.toSet
    val got = ScoringOps.mmrRerank(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    // diversification bites: at least one lang's MMR order differs from
    // the hybrid RRF order beyond rank 1
    val mmrOrder = got.groupBy(_._1).map { case (l, rs) =>
      l -> rs.toSeq.sortBy(_._2).map(_._3)
    }
    assert(pool.exists { case (l, ids) => mmrOrder(l) != ids },
      "MMR never reordered the hybrid list")
  }
}
