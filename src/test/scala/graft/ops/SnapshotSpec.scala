package graft.ops

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(java.lang.Long, String, String)]) =
    rows.toDF("id", "a", "b")

  test("diff classifies added/removed/changed and drops identical keys") {
    val prev = frame(Seq(
      (1L, "x", "p"),         // unchanged
      (2L, "y", "q"),         // value change in a
      (3L, null, "r"),        // NULL -> value transition in a
      (4L, "z", "s")))        // key vanishes today
    val cur = frame(Seq(
      (1L, "x", "p"),
      (2L, "Y", "q"),
      (3L, "now", "r"),
      (5L, "new", "t")))      // key appears today
    val got = Snapshot.diff(cur, prev, Seq("id"), Seq("a", "b"))
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (2L, "changed"), (3L, "changed"), (4L, "removed"), (5L, "added")))
  }

  test("NULL business keys surface as added+removed, never silently vanish") {
    val prev = frame(Seq((null, "x", "p"), (1L, "a", "b")))
    val cur = frame(Seq((null, "x", "p"), (1L, "a", "b")))
    // NULL keys never join (SQL semantics): the same malformed row shows
    // up on both sides of the report instead of disappearing
    val got = Snapshot.diff(cur, prev, Seq("id"), Seq("a", "b"))
      .select("change").as[String].collect().sorted.toSeq
    assert(got == Seq("added", "removed"))
  }

  test("value-column NULL equality is null-safe: NULL==NULL is unchanged") {
    val prev = frame(Seq((1L, null, "p")))
    val cur = frame(Seq((1L, null, "p")))
    assert(Snapshot.diff(cur, prev, Seq("id"), Seq("a", "b")).isEmpty)
  }

  test("incremental score touches exactly the added+changed doc_ids") {
    import org.apache.spark.sql.functions.col
    val diff = graft.pipelines.MicroQueries.snapshotDiff(spark, sfDir)
      .as[(Long, String)].collect()
    val expIds = diff.collect {
      case (id, c) if c == "added" || c == "changed" => id }.toSet
    // removed keys are ghosts (no document row) and must NOT appear
    val got = graft.pipelines.MicroQueries.incrementalScore(spark, sfDir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == expIds.filter(_ < 1000000000L))
    assert(got.nonEmpty)
    // scores agree with the full-corpus scoring on the delta
    val full = graft.ext.TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val scored = graft.pipelines.MicroQueries.incrementalScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .as[(Long, Double)].collect()
    scored.foreach { case (id, s) => assert(s == full(id), s"doc $id") }
  }

  test("corpus drift: brute-force TV parity on the source feature") {
    import org.apache.spark.sql.functions.col
    val got = graft.pipelines.MicroQueries.corpusDrift(spark, sfDir)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet ==
      Set("source", "lang", "n_chars_bucket"))
    // rebuild prev's source histogram by the documented seeding rules
    // and recompute the TV numerator exactly
    val docs = graft.ext.TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toSeq
    val curH = docs.groupBy(_._2).map { case (s, v) => s -> v.size.toLong }
    val prevDocs = docs.filter(_._1 % 13 != 0) ++
      docs.filter(_._1 % 11 == 0)
    val prevH = prevDocs.groupBy(_._2)
      .map { case (s, v) => s -> v.size.toLong }
    val (np, nc) = (prevDocs.size.toLong, docs.size.toLong)
    val bins = (curH.keySet ++ prevH.keySet).toSeq
    val num = bins.map(b =>
      (prevH.getOrElse(b, 0L) * nc - curH.getOrElse(b, 0L) * np).abs).sum
    val expected = num.toDouble / (2L * np * nc).toDouble
    val (_, nBins, gotNp, gotNc, tv, drifted) = got("source")
    assert(nBins == bins.size.toLong)
    assert(gotNp == np && gotNc == nc)
    assert(tv == expected, s"tv $tv != $expected")
    assert(drifted ==
      (tv > graft.pipelines.MicroQueries.driftTvMax))
    // every feature's flag agrees with its own tv
    got.values.foreach { case (f, _, _, _, t, d) =>
      assert(d == (t > graft.pipelines.MicroQueries.driftTvMax), f)
    }
  }

}
