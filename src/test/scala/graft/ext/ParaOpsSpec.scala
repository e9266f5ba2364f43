package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Keep-first paragraph dedup contract: the keeper is the GLOBAL
  * minimum (doc_id, pos) occurrence, apply removes exactly
  * (n_copies - 1) occurrences per group, unique paragraphs pass
  * through byte-stable, and reassembly preserves in-doc order.
  */
class ParaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("seeded quote repeats corpus-wide and keeps its first occurrence") {
    val det = ParaOps.paragraphDedup(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val quote = det(ParaOps.paraQuote)
    // every doc_id % 4 == 1 doc carries the quote exactly once
    val carriers = TextOps.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 1).count()
    assert(quote._2 == carriers, "quote copy count == carrier docs")
    // keeper is the smallest carrier id, at the seeded mid position 1
    val minCarrier = TextOps.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 1)
      .agg(min("doc_id")).as[Long].head()
    assert(quote._3 == minCarrier && quote._4 == 1L,
      s"keeper must be (doc $minCarrier, pos 1), got (${quote._3}, ${quote._4})")
  }

  test("keepers are global minima and copy counts match the stream") {
    val paras = ParaOps.seededParagraphs(spark, sfDir)
      .select(col("doc_id"), posexplode(col("paras")).as(Seq("pos", "para")))
      .as[(Long, Int, String)].collect()
    val byPara = paras.groupBy(_._3)
    val det = ParaOps.paragraphDedup(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(det.nonEmpty, "fixture must contain repeated paragraphs")
    for ((p, n, kd, kp) <- det) {
      val occs = byPara(p).map(o => (o._1, o._2.toLong)).sorted
      assert(occs.size.toLong == n, s"copy count for '$p'")
      assert(occs.head == ((kd, kp)), s"keeper must be min occurrence of '$p'")
    }
    // detection reports exactly the >1-occurrence groups
    assert(det.length == byPara.count(_._2.size > 1))
  }

  test("apply removes exactly the non-keeper copies, order-stable") {
    val paras = ParaOps.seededParagraphs(spark, sfDir)
      .select(col("doc_id"), posexplode(col("paras")).as(Seq("pos", "para")))
      .as[(Long, Int, String)].collect()
    val keepOrd = paras.groupBy(_._3).map { case (p, occ) =>
      p -> occ.map(o => o._1 * ParaOps.paraOrdBase + o._2).min
    }
    val expect = paras.groupBy(_._1).map { case (d, occ) =>
      val sorted = occ.sortBy(_._2)
      val kept = sorted.filter(o =>
        o._1 * ParaOps.paraOrdBase + o._2 == keepOrd(o._3))
      d -> ((kept.map(_._3).mkString("\n"), sorted.length.toLong,
        (sorted.length - kept.length).toLong))
    }
    val got = ParaOps.paragraphDedupApply(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == expect.keySet, "every exploded doc appears once")
    for ((d, want) <- expect)
      assert(got(d) == want, s"doc $d rewrite")
    // conservation: total removals == sum over groups of (copies - 1)
    val removedTotal = got.values.map(_._3).sum
    val wantRemoved = paras.groupBy(_._3).values
      .map(o => (o.size - 1).toLong).sum
    assert(removedTotal == wantRemoved)
  }

  test("keep-first differs from the boilerplate threshold by design") {
    // a 2-copy paragraph: invisible to lineBoilerplate's share filter
    // (2 docs never clear half a source), but keep-first must act on it
    val twoCopy = ParaOps.paragraphDedup(spark, sfDir)
      .filter(col("n_copies") === 2).count()
    assert(twoCopy > 0,
      "fixture must exercise the 2-copy case the threshold filter skips")
  }
}
