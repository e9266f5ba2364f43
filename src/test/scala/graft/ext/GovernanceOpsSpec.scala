package graft.ext

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-call takedown sweep: every persisted derived tier gets a
  * stamped forget generation, doc-keyed tiers provably contain no
  * forgotten id, count-ledger tiers land EXACTLY on the
  * never-ingested state (subtractive forget ≡ rebuild on survivors),
  * a takedown naming only never-ingested docs is a provable no-op on
  * the ledgers (the clip rule), and a replayed sweep reads instead of
  * re-applying.
  */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mtimes(root: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new File(root)).map(f => f.getPath -> f.lastModified()).toMap
  }

  private def assertSameRows(got: DataFrame, want: DataFrame,
                             what: String): Unit = {
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"$what diverges from the never-ingested state")
  }

  test("takedown sweep hits all six tiers, exact on ledgers, replays as reads") {
    val tag = s"sweep${System.nanoTime()}"
    val docs = TextOps.documents(spark, sfDir)
    val gone = docs.filter(col("doc_id") % 20 === 0)
    val goneIds = gone.select("doc_id").as[Long].collect().toSet
    assert(goneIds.nonEmpty)

    val dirs = GovernanceOps.takedownSweep(spark, sfDir, gone, tag)
    assert(dirs.keySet == GovernanceOps.takedownTiers.toSet)
    for ((t, d) <- dirs)
      assert(new File(d).isDirectory, s"$t dir missing: $d")

    // doc-keyed tiers: no forgotten id survives in any table
    def idsIn(path: String, idCol: String): Set[Long] =
      spark.read.parquet(path).select(idCol).as[Long].collect().toSet
    assert(idsIn(s"${dirs("sha_ledger")}/rows", "doc_id")
      .intersect(goneIds).isEmpty, "sha rows still hold forgotten ids")
    val keepers = spark.read.parquet(s"${dirs("sha_ledger")}/groups")
      .select("keep_doc_id").as[Long].collect().toSet
    assert(keepers.intersect(goneIds).isEmpty,
      "sha groups still keep a forgotten doc")
    for (t <- Seq("bands", "shingles", "sigs"))
      assert(idsIn(s"${dirs("lsh_index")}/$t", "doc_id")
        .intersect(goneIds).isEmpty, s"lsh $t still holds forgotten ids")
    assert(idsIn(s"${dirs("ivf_index")}/postings", "vec_id")
      .intersect(goneIds).isEmpty, "ivf postings still hold forgotten ids")

    // count-ledger tiers: EXACTLY the never-ingested state — the word
    // ledgers equal a fresh count over (base slice minus forgotten),
    // the LM bigram table equals countTables on the surviving slice
    val survivors = docs.filter(col("doc_id") % 20 =!= 0)
    val wordLedger = survivors.filter(col("doc_id") % 2 === 0)
      .select(explode(CurationOps.toksCol).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    for (t <- Seq("bpe_index", "unigram_index"))
      assertSameRows(
        spark.read.parquet(s"${dirs(t)}/words").select("w", "f"),
        wordLedger, s"$t word ledger")
    val (wantCab, _) =
      LmOps.countTables(LmOps.inBaseSlice(survivors))
    assertSameRows(
      spark.read.parquet(s"${dirs("lm_index")}/cab")
        .select("lang", "a", "b", "c_ab"),
      wantCab, "lm bigram table")

    // replay: same tag returns the same dirs and touches nothing
    val before = dirs.map { case (t, d) => t -> mtimes(d) }
    val again = GovernanceOps.takedownSweep(spark, sfDir, gone, tag)
    assert(again == dirs, "replayed sweep must return the same dirs")
    for ((t, d) <- dirs)
      assert(mtimes(d) == before(t),
        s"replayed sweep rewrote $t — SUCCESS gate failed")
  }

  test("clip rule: never-ingested docs are a no-op on the count ledgers") {
    // doc_id % 10 = 3 is odd and ≢ 0 mod 10 — outside the LM (%10=0)
    // and BPE/unigram (%2=0) ingest slices. An unclipped subtractive
    // forget would corrupt shared words' mass here (the bug this
    // pins); the clip makes all three ledgers bit-identical to base.
    val tag = s"noop${System.nanoTime()}"
    val outside = TextOps.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 3)
    assert(outside.count() > 0)
    val dirs = GovernanceOps.takedownSweep(spark, sfDir, outside, tag)

    def table(dir: String, t: String): DataFrame =
      spark.read.parquet(s"$dir/$t")
    assertSameRows(table(dirs("bpe_index"), "words"),
      table(BpeOps.bpeIndex(spark, sfDir), "words"), "bpe ledger (no-op)")
    assertSameRows(table(dirs("unigram_index"), "words"),
      table(UnigramOps.unigramIndex(spark, sfDir), "words"),
      "unigram ledger (no-op)")
    assertSameRows(table(dirs("lm_index"), "cab"),
      spark.read.parquet(s"${LmOps.lmIndexDir(sfDir)}/cab"),
      "lm cab (no-op)")
  }

  test("kanonRelease: conservation, no named under-k cell, exact fold") {
    import org.apache.spark.sql.functions._
    val raw = TextOps.documents(spark, sfDir)
      .select(col("lang"), col("source"),
        size(CurationOps.toksCol).cast("long").as("t"))
      .as[(String, String, Long)].collect()
    val cells = raw.groupBy(r => (r._1, r._2)).map { case ((l, src), rs) =>
      (l, src, rs.length.toLong, rs.map(_._3).sum)
    }.toSeq
    val rel = GovernanceOps.kanonRelease(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect()

    // released NAMED cells are exactly the >= k cells, values intact
    val named = rel.filter(_._2 != GovernanceOps.kAnonOther)
    assert(named.forall(_._3 >= GovernanceOps.kAnonMinDocs))
    assert(named.forall(_._5 == 1L), "named rows fold exactly one cell")
    val wantNamed = cells.filter(_._3 >= GovernanceOps.kAnonMinDocs)
      .map(c => (c._1, c._2, c._3, c._4, 1L)).toSet
    assert(named.toSet == wantNamed)

    // the fold row per lang carries exactly the suppressed cells' mass
    for ((lang, rows) <- cells.groupBy(_._1)) {
      val supp = rows.filter(_._3 < GovernanceOps.kAnonMinDocs)
      val other = rel.find(r =>
        r._1 == lang && r._2 == GovernanceOps.kAnonOther)
      if (supp.isEmpty) assert(other.isEmpty, s"$lang spurious fold row")
      else {
        val o = other.getOrElse(fail(s"$lang missing fold row"))
        assert(o._3 == supp.map(_._3).sum && o._4 == supp.map(_._4).sum
          && o._5 == supp.length.toLong, s"$lang fold mismatch")
      }
    }
    // suppression reassigns, never deletes: totals conserve per lang
    for ((lang, rows) <- rel.groupBy(_._1)) {
      val rawL = cells.filter(_._1 == lang)
      assert(rows.map(_._3).sum == rawL.map(_._3).sum)
      assert(rows.map(_._4).sum == rawL.map(_._4).sum)
    }
    // both paths live on the fixture
    assert(named.nonEmpty && rel.exists(_._2 == GovernanceOps.kAnonOther))
  }

  test("dp ladder realizes the discrete-Laplace lattice measure exactly") {
    val t = GovernanceOps.dpThresholds
    assert(t.map(_._2) == t.map(_._2).sorted, "CDF must be nondecreasing")
    assert(t.last._2 <= 4294967296L)
    // per-z lattice measure vs the closed form, within one lattice step
    val alpha = math.exp(-GovernanceOps.dpEps)
    val byZ = t.toMap
    def measure(z: Int): Long =
      byZ(z) - (if (z == -GovernanceOps.dpZMax) 0L else byZ(z - 1))
    for (z <- -GovernanceOps.dpZMax + 1 until GovernanceOps.dpZMax - 1) {
      val want = (1 - alpha) / (1 + alpha) * math.pow(alpha, math.abs(z))
      assert(math.abs(measure(z) - want * 4294967296.0) <= 1.0,
        s"z=$z lattice measure off: ${measure(z)}")
    }
    // total measure = the whole lattice (ELSE branch takes the rest)
    val rest = 4294967296L - byZ(GovernanceOps.dpZMax - 1)
    assert((t.map(_._1).map(measure).sum + rest) == 4294967296L)
    // the far tail has zero realized measure (the clamp's honest δ)
    assert(measure(-GovernanceOps.dpZMax + 1) == 0L,
      "lattice tail should vanish before the clamp for eps=1")
  }

  private def releasedSet(named: Array[(String, String, Long, Long, Long)],
                          k: (String, String)): Boolean =
    named.exists(r => (r._1, r._2) == k)

  test("dp release: deterministic, noise-bounded, suppression folds " +
      "noisy mass exactly, tag change redraws") {
    import spark.implicits._
    val cells = TextOps.documents(spark, sfDir)
      .select(col("lang"), col("source"),
        least(size(CurationOps.toksCol).cast("long"),
          lit(GovernanceOps.dpClip)).as("n_tok"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("t"))
      .as[(String, String, Long, Long)].collect()
      .map(c => (c._1, c._2) -> (c._3, c._4)).toMap
    val rel = GovernanceOps.dpRelease(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect()
    val rel2 = GovernanceOps.dpRelease(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rel.sortBy(r => (r._1, r._2)).toSeq ==
      rel2.sortBy(r => (r._1, r._2)).toSeq, "same tag, same noise")

    val named = rel.filter(_._2 != GovernanceOps.dpSuppressed)
    assert(named.nonEmpty && named.forall(_._5 == 1L))
    assert(named.forall(_._3 >= GovernanceOps.dpTau),
      "released-by-name cells must clear the noisy threshold")
    assert(named.forall(r =>
      math.abs(r._3 - cells(r._1 -> r._2)._1) <= GovernanceOps.dpZMax),
      "count noise must respect the clamp")
    assert(named.forall(r =>
      math.abs(r._4 - cells(r._1 -> r._2)._2) <=
        GovernanceOps.dpClip * GovernanceOps.dpZMax),
      "token noise must respect clip*clamp")
    // noise is non-degenerate on this fixture: some cell really moved
    assert(named.exists(r => r._3 != cells(r._1 -> r._2)._1),
      "every released count equals its true count — ladder inert?")

    // independent JVM recomputation of the whole mechanism: md5 via
    // MessageDigest + the same ladder — cross-checks Spark's md5/instr
    // path against plain Scala, cell by cell
    def jvmNoise(lang: String, source: String, suffix: String = ""): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$lang|$source|${GovernanceOps.dpTag}$suffix"
          .getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val fold = java.lang.Long.parseLong(hex.take(8), 16)
      GovernanceOps.dpThresholds.find(fold < _._2).map(_._1.toLong)
        .getOrElse(GovernanceOps.dpZMax.toLong)
    }
    val noisyCells = cells.map { case ((l, s), (n, t)) =>
      (l, s) -> (n + jvmNoise(l, s),
        t + GovernanceOps.dpClip * jvmNoise(l, s, ":tok")) }
    for (r <- named) {
      assert(r._3 == noisyCells(r._1 -> r._2)._1,
        s"${r._1}/${r._2}: engine noisy count != JVM recomputation")
      assert(r._4 == noisyCells(r._1 -> r._2)._2,
        s"${r._1}/${r._2}: engine noisy token sum != JVM recomputation")
    }
    assert(noisyCells.forall { case (k, (noisy, _)) =>
      (noisy >= GovernanceOps.dpTau) == releasedSet(named, k)
    }, "release decision must be exactly noisy >= tau")
    // the two statistics draw independent noise: the z values differ
    // somewhere on this fixture (same z everywhere = shared seed bug)
    assert(cells.keys.exists { case (l, s) =>
      jvmNoise(l, s) != jvmNoise(l, s, ":tok") },
      "count and token draws must be independent")

    // fold rows: count of hidden cells + exact noisy-mass conservation
    val releasedKeys = named.map(r => r._1 -> r._2).toSet
    for ((lang, fold) <-
           rel.filter(_._2 == GovernanceOps.dpSuppressed).map(r => r._1 -> r)) {
      val hidden = cells.keys.filter(k =>
        k._1 == lang && !releasedKeys.contains(k)).toSeq
      assert(fold._5 == hidden.size.toLong, s"$lang fold n_cells")
      assert(fold._3 == hidden.map(noisyCells(_)._1).sum,
        s"$lang fold row must carry exactly the hidden cells' noisy mass")
      assert(fold._4 == hidden.map(noisyCells(_)._2).sum,
        s"$lang fold row must carry exactly the hidden noisy token mass")
    }
    assert(rel.map(_._5).sum == cells.size.toLong,
      "every cell lands exactly once, named or folded")

    // a new release tag spends fresh budget: at least one draw differs
    val rel3 = GovernanceOps.dpRelease(spark, sfDir, tag = "graft_dp_v2")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(named.exists(r => rel3.get(r._1 -> r._2).exists(_ != r._3)) ||
      named.exists(r => !rel3.contains(r._1 -> r._2)),
      "tag change must redraw the noise")
  }

  test("dp utility row agrees with the release, cell by cell") {
    import spark.implicits._
    val rel = GovernanceOps.dpRelease(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect()
    val util = GovernanceOps.dpUtility(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(u => u._1 -> u).toMap
    val namedByLang = rel.filter(_._2 != GovernanceOps.dpSuppressed)
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for ((lang, u) <- util) {
      assert(u._3 == namedByLang.getOrElse(lang, 0L),
        s"$lang: n_named must equal the release's named-row count")
      assert(u._2 == u._3 + u._4, s"$lang: cells = named + suppressed")
      assert(u._5 <= u._2 * GovernanceOps.dpZMax &&
        u._6 <= u._2 * GovernanceOps.dpClip * GovernanceOps.dpZMax,
        s"$lang: absolute noise must respect the clamp")
    }
    assert(util.values.map(_._2).sum == rel.map(_._5).sum,
      "utility and release must see the same cell population")
    assert(util.values.exists(_._5 > 0L),
      "zero injected noise across every lang — ladder inert?")
  }

  test("dp budget accountant: a tag is charged once, re-release is " +
      "free, exhaustion refuses BEFORE reading data") {
    val ledger = new File("target/dp_ledger/spec.ledger")
    org.apache.commons.io.FileUtils.deleteQuietly(ledger)
    GovernanceOps.dpReleaseAccounted(spark, sfDir, ledger = ledger).count()
    assert(GovernanceOps.dpSpent(ledger) ==
      Map(GovernanceOps.dpTag -> GovernanceOps.dpEpochSpend))
    // re-running the same epoch re-serves, never re-charges
    GovernanceOps.dpReleaseAccounted(spark, sfDir, ledger = ledger).count()
    assert(GovernanceOps.dpSpent(ledger).values.sum ==
      GovernanceOps.dpEpochSpend, "same tag must not double-charge")
    // fresh tags accumulate until the budget gate trips
    val epochs = (GovernanceOps.dpBudget / GovernanceOps.dpEpochSpend).toInt
    for (i <- 2 to epochs)
      GovernanceOps.dpReleaseAccounted(spark, sfDir, tag = s"epoch_$i",
        ledger = ledger).count()
    assert(GovernanceOps.dpSpent(ledger).values.sum ==
      GovernanceOps.dpBudget, "budget fully allocated")
    val e = intercept[IllegalStateException] {
      GovernanceOps.dpReleaseAccounted(spark, sfDir, tag = "one_too_many",
        ledger = ledger)
    }
    assert(e.getMessage.contains("budget exhausted"), e.getMessage)
    assert(!GovernanceOps.dpSpent(ledger).contains("one_too_many"),
      "a refused epoch must not be charged")
    // the spent set survives the refusal intact: replaying any charged
    // tag still serves
    GovernanceOps.dpReleaseAccounted(spark, sfDir, tag = "epoch_2",
      ledger = ledger).count()
  }
}
