package graft.ext

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank equals a driver-side fixed-point reference, exactly") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assume(pairs.nonEmpty)
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    val r0 = GraphOps.pageRankScale / n
    val base = r0 * 15L / 100L
    var r = deg.keys.map(_ -> r0).toMap
    for (_ <- 1 to GraphOps.pageRankIters) {
      val sums = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = deg.keys.map(v => v ->
        (base + sums.getOrElse(v, 0L) * GraphOps.dampNum
          / GraphOps.dampDen)).toMap
    }
    val got = GraphOps.pageRank(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == r.keySet)
    got.foreach { case (id, rank, norm) =>
      assert(rank == r(id), s"rank differs at node $id")
      assert(norm == rank.toDouble / GraphOps.pageRankScale.toDouble)
    }
    // fixed-point truncation loses mass but never creates it, and the
    // loss is bounded: each of the 3 rounds truncates < 1 unit per
    // edge-contribution plus < 1 per damping/base division
    val mass = got.map(_._2).sum
    assert(mass <= GraphOps.pageRankScale)
    val bound = GraphOps.pageRankIters.toLong * (edges.length + 2 * n)
    assert(GraphOps.pageRankScale - mass <= bound,
      s"mass leak ${GraphOps.pageRankScale - mass} exceeds bound $bound")
  }

  test("triangles equal a brute-force closed-wedge count") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assume(pairs.nonEmpty)
    val edgeSet = pairs.toSet
    val nbrs = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expTri = nbrs.keys.map { v =>
      val ns = nbrs(v).toSeq
      v -> (for {
        i <- ns.indices; j <- (i + 1) until ns.length
        a = math.min(ns(i), ns(j)); b = math.max(ns(i), ns(j))
        if edgeSet.contains((a, b))
      } yield 1).size.toLong
    }.toMap
    val got = GraphOps.triangles(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == nbrs.keySet)
    got.foreach { case (id, deg, nTri, coef) =>
      assert(deg == nbrs(id).size.toLong, s"degree differs at $id")
      assert(nTri == expTri(id), s"triangle count differs at $id")
      val expCoef = if (deg >= 2)
        (2.0 * nTri) / (deg.toDouble * (deg - 1).toDouble) else 0.0
      assert(coef == expCoef, s"coefficient differs at $id")
      assert(coef >= 0.0 && coef <= 1.0)
    }
    assert(got.exists(_._3 > 0), "fixture graph has no triangles")
  }
}
