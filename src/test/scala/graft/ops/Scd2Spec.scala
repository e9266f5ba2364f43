package graft.ops

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim0 = Seq(
    (1L, 10.0, "A", "2026-01-01", null.asInstanceOf[String], true),
    (2L, 20.0, "A", "2026-01-01", null.asInstanceOf[String], true),
    (3L, 30.0, "B", "2026-01-01", null.asInstanceOf[String], true))
    .toDF("k", "bal", "seg", "valid_from", "valid_to", "is_current")

  test("merge versions changed keys, inserts new, passes through rest") {
    // day 1: k=2 changes bal, k=4 is new, k=3 vanishes from the extract
    val snap1 = Seq((1L, 10.0, "A"), (2L, 25.0, "A"), (4L, 40.0, "C"))
      .toDF("k", "bal", "seg")
    val d1 = Scd2.merge(dim0, snap1, Seq("k"), Seq("bal", "seg"),
      "2026-02-01")
    val rows1 = d1.as[(Long, Double, String, String, String, Boolean)]
      .collect().toSet
    assert(rows1 == Set(
      (1L, 10.0, "A", "2026-01-01", null, true), // unchanged
      (2L, 20.0, "A", "2026-01-01", "2026-02-01", false), // closed
      (2L, 25.0, "A", "2026-02-01", null, true), // reopened
      (3L, 30.0, "B", "2026-01-01", null, true), // absent: stays current
      (4L, 40.0, "C", "2026-02-01", null, true))) // inserted

    // day 2 folds ON TOP of day 1: k=2 changes again (3 versions),
    // k=4 unchanged, k=1 changes seg only
    val snap2 = Seq((1L, 10.0, "Z"), (2L, 26.0, "A"), (3L, 30.0, "B"),
      (4L, 40.0, "C")).toDF("k", "bal", "seg")
    val d2 = Scd2.merge(d1, snap2, Seq("k"), Seq("bal", "seg"),
      "2026-03-01")
    val rows2 = d2.as[(Long, Double, String, String, String, Boolean)]
      .collect()
    // exactly one current row per key, history monotone and preserved
    val byKey = rows2.groupBy(_._1)
    assert(byKey.keySet == Set(1L, 2L, 3L, 4L))
    byKey.foreach { case (k, vs) =>
      assert(vs.count(_._6) == 1, s"key $k: != 1 current row")
      vs.filter(!_._6).foreach { v =>
        assert(v._5 != null, s"key $k: closed row without valid_to")
        assert(v._4 < v._5, s"key $k: valid_from !< valid_to")
      }
    }
    assert(byKey(2L).length == 3) // two changes → three versions
    assert(byKey(2L).filter(_._6).head._2 == 26.0)
    assert(byKey(1L).length == 2) // seg-only change versions too
    assert(byKey(1L).filter(_._6).head._3 == "Z")
    assert(byKey(3L).length == 1 && byKey(3L).head._6) // still current
    assert(byKey(4L).length == 1 && byKey(4L).head._6) // unchanged insert
    // day-1 closed version of k=2 survived day 2 untouched
    assert(rows2.contains((2L, 20.0, "A", "2026-01-01", "2026-02-01",
      false)))
    assert(rows2.contains((2L, 25.0, "A", "2026-02-01", "2026-03-01",
      false)))
  }

  test("NULL business keys pass through / insert, never vanish") {
    val dim = Seq(
      (Option(1L), 10.0, "A", "2026-01-01",
        null.asInstanceOf[String], true),
      (Option.empty[Long], 99.0, "X", "2026-01-01",
        null.asInstanceOf[String], true)) // malformed feed row
      .toDF("k", "bal", "seg", "valid_from", "valid_to", "is_current")
    val snap = Seq((Option(1L), 10.0, "A"), (Option.empty[Long], 7.0, "Y"))
      .toDF("k", "bal", "seg")
    val out = Scd2.merge(dim, snap, Seq("k"), Seq("bal", "seg"),
      "2026-02-01")
      .as[(Option[Long], Double, String, String, String, Boolean)]
      .collect().toSet
    // NULL keys never join: the dim's NULL row passes through as
    // current, the snapshot's NULL row inserts — nothing is dropped
    assert(out == Set(
      (Some(1L), 10.0, "A", "2026-01-01", null, true),
      (None, 99.0, "X", "2026-01-01", null, true),
      (None, 7.0, "Y", "2026-02-01", null, true)))
  }

  test("null-safe tracked compare: NULL -> value spawns a version") {
    val dim = Seq(
      (1L, null.asInstanceOf[java.lang.Double], "A", "2026-01-01",
        null.asInstanceOf[String], true))
      .toDF("k", "bal", "seg", "valid_from", "valid_to", "is_current")
    val snap = Seq((1L, java.lang.Double.valueOf(5.0), "A"))
      .toDF("k", "bal", "seg")
    val out = Scd2.merge(dim, snap, Seq("k"), Seq("bal", "seg"),
      "2026-02-01")
      .as[(Long, Option[Double], String, String, String, Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, None, "A", "2026-01-01", "2026-02-01", false),
      (1L, Some(5.0), "A", "2026-02-01", null, true)))
  }
}
