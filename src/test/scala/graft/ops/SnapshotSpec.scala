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

}
