package graft

import graft.algos._
import graft.fixtures.Fixtures
import graft.graph.LinkGraph

/** Seeded random graphs vs tiny sequential oracles (SURVEY.md §5.2-2). */
class RandomOracleSpec extends SparkSpec {

  private val nodes = 120
  private val edges = Fixtures.randomEdges(nodes, 700, seed = 42L)

  private def bfsComponents(n: Int, es: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = Array.fill(n)(List.empty[Int])
    es.foreach { case (u, v) =>
      if (u != v) {
        adj(u.toInt) ::= v.toInt
        adj(v.toInt) ::= u.toInt
      }
    }
    val comp = Array.fill(n)(-1L)
    (0 until n).foreach { s =>
      if (comp(s) < 0) {
        var queue = List(s); comp(s) = s.toLong
        while (queue.nonEmpty) {
          val u = queue.head; queue = queue.tail
          adj(u).foreach { v =>
            if (comp(v) < 0) { comp(v) = s.toLong; queue ::= v }
          }
        }
      }
    }
    // min-id labeling: BFS from ascending s guarantees comp = min id
    (0 until n).map(i => i.toLong -> comp(i)).toMap
  }

  private def bruteTriangles(n: Int, es: Seq[(Long, Long)]): Long = {
    val adj = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    es.foreach { case (u, v) =>
      if (u != v) { adj(u.toInt) += v.toInt; adj(v.toInt) += u.toInt }
    }
    var count = 0L
    for (a <- 0 until n; b <- adj(a) if b > a; c <- adj(b) if c > b)
      if (adj(a).contains(c)) count += 1
    count
  }

  test("PageRank matches sequential reference oracle at convergence") {
    val g = LinkGraph(edgesDF(edges))
    val cfg = PageRankConfig(maxIterations = 60, tolerance = 1e-9)
    val res = PageRank.run(g, cfg)
    val (ref, _, _) = ReferencePageRank.run(nodes,
      edges.map { case (u, v) => (u.toInt, v.toInt) }, cfg)
    val got = res.scores.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    allClose(got, ref.map(_.toDouble).toSeq)
  }

  test("WCC matches BFS component oracle exactly") {
    val g = LinkGraph(edgesDF(edges))
    val res = Wcc.run(g)
    assert(res.stats.converged)
    val got = res.components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bfsComponents(nodes, edges))
  }

  test("WCC with label-class contraction matches BFS oracle exactly") {
    // Afforest-analogue contraction (WccConfig.contractAfter) must leave
    // the labeling bit-identical at every contraction point.
    val g = LinkGraph(edgesDF(edges))
    val want = bfsComponents(nodes, edges)
    Seq(1, 2, 3).foreach { k =>
      val res = Wcc.run(g, WccConfig(contractAfter = k))
      assert(res.stats.converged, s"contractAfter=$k not converged")
      val got = res.components.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"contractAfter=$k")
    }
  }

  test("WCC contraction survives the naive-prune counterexample") {
    // Path 5-6-9-0 after one hash-min round labels {5:5, 6:5, 9:0, 0:0}: a
    // same-label edge DROP would remove both (5,6) and (9,0),
    // disconnecting 5 from its component forever. Contraction keeps the
    // label-class edge (5,0) and must still converge to all-0 labels.
    // Plus a long cycle whose ids run against the propagation direction
    // (one hop per round) to force multi-level recursion.
    val path = Seq((5L, 6L), (6L, 9L), (9L, 0L))
    val cycle = (1L until 40L).map(i => (100L + i, 100L + i - 1)) :+
      (100L, 139L)
    val es = path ++ cycle
    val n = 140
    val want = bfsComponents(n, es)
    Seq(1, 2).foreach { k =>
      val got = Wcc.run(LinkGraph(edgesDF(es)),
        WccConfig(contractAfter = k)).components.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"contractAfter=$k")
    }
  }

  test("AUTO contraction (default config) engages and stays exact") {
    // Default WccConfig is now AUTO (contractAfter = -1, mirroring the
    // reference's default Afforest); the production floor keeps toy graphs
    // plain, so force the size precondition with autoContractMinState = 1
    // and reuse the adversarial cycle fixture (ids run against propagation).
    val cycle = ((1L until 40L).map(i => (100L + i, 100L + i - 1)) :+
      (100L, 139L))
    val n = 140
    val g = () => LinkGraph(edgesDF(cycle))
    val auto = Wcc.run(g(), WccConfig(), autoContractMinState = 1L)
    assert(auto.stats.converged)
    val got = auto.components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bfsComponents(n, cycle), "auto labels != BFS oracle")
    // engagement proof: a 40-cycle cannot converge in 3 plain hash-min+jump
    // rounds, but WITH auto contraction (engaged at round 2, recursing on
    // the contracted classes) the same budget converges — so the heuristic
    // demonstrably fired.
    val capped = WccConfig(maxIterations = 3)
    assert(!Wcc.run(g(), capped.copy(contractAfter = 0)).stats.converged,
      "fixture too easy: plain WCC converged in 3 rounds")
    assert(Wcc.run(g(), capped, autoContractMinState = 1L).stats.converged,
      "auto contraction did not engage within the capped budget")
    // and the production floor really does keep small graphs plain: with
    // the default floor the capped run must behave like contractAfter = 0
    assert(!Wcc.run(g(), capped).stats.converged)
  }

  test("auto contraction with an EMPTY label-class graph converges exactly") {
    // chain 3-2-1-0: after round 2 only vertex 3 changed (to the final
    // label 0) while every edge is already intra-class, so the contracted
    // graph has ZERO vertices — the recursion must handle the empty sparse
    // graph and the composition must be the identity. Observed live on the
    // 448M-edge graph (19 movers, empty class graph, BASELINE.md); this
    // pins the path deterministically.
    val chain = Seq((3L, 2L), (2L, 1L), (1L, 0L))
    val res = Wcc.run(LinkGraph(edgesDF(chain)), WccConfig(),
      autoContractMinState = 1L)
    assert(res.stats.converged)
    val got = res.components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("auto-engagement rule: round, size floor, work-remaining") {
    import Wcc.autoEngage
    assert(!autoEngage(1, 1000000L, 1000000L, 100000L)) // before round 2
    assert(autoEngage(2, 1000000L, 100000L, 100000L)) // work remains
    // the sparse tail still engages: full rounds cost full scans no matter
    // how few labels move (the 112M-edge measurement in the scaladoc)
    assert(autoEngage(2, 1000000L, 1L, 100000L))
    assert(!autoEngage(2, 1000000L, 0L, 100000L)) // converged: nothing left
    assert(!autoEngage(2, 99999L, 99999L, 100000L)) // under the floor
  }

  test("sparse-vertex WCC labels edge-incident vertices identically") {
    val g = LinkGraph(edgesDF(edges))
    val dense = Wcc.run(g).components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sparse = Wcc.run(g, sparseVertices = true).components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incident = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1, e._2)).toSet
    assert(sparse.keySet == incident)
    incident.foreach(v => assert(sparse(v) == dense(v), s"vertex $v"))
  }

  test("triangle count matches brute-force oracle exactly") {
    val g = LinkGraph(edgesDF(edges))
    assert(TriangleCount.run(g) == bruteTriangles(nodes, edges))
    // the large-graph adjacency-intersection shape (forced via
    // wedgeMax = 0) must agree with the same oracle on the random graph
    assert(TriangleCount.run(g, wedgeMax = 0L) ==
      bruteTriangles(nodes, edges))
  }

  test("sync LPA matches sequential oracle exactly (fixed iterations)") {
    val k = 5
    val g = LinkGraph(edgesDF(edges))
    val res = LabelPropagation.run(g, LabelPropagationConfig(k))
    // sequential synchronous LPA with smallest-label tie-break, multiset
    var labels = (0 until nodes).map(_.toLong).toArray
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1)))
    var it = 0
    var changedAny = true
    while (it < k && changedAny) {
      val next = labels.clone()
      val byDst = und.groupBy(_._2)
      (0 until nodes).foreach { v =>
        byDst.get(v.toLong).foreach { inc =>
          val freq = inc.groupBy(e => labels(e._1.toInt))
            .view.mapValues(_.size).toMap
          val best = freq.toSeq.map { case (l, c) => (-c, l) }.min._2
          next(v) = best
        }
      }
      changedAny = !next.sameElements(labels)
      labels = next
      it += 1
    }
    val got = res.labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until nodes).forall(v => got(v.toLong) == labels(v)),
      s"LP mismatch: got=${got.toSeq.sortBy(_._1).take(20)} " +
        s"want=${labels.take(20).toSeq}")
  }

  test("SSSP matches Dijkstra oracle exactly") {
    val wedges = edges.zipWithIndex.map { case ((u, v), i) =>
      (u, v, 1.0 + (i % 7))
    }
    val g = LinkGraph(edgesDF(wedges.map(e => (e._1, e._2)),
      wedges.map(_._3)))
    val res = Sssp.run(g, SsspConfig(0L))
    // Dijkstra
    val dist = Array.fill(nodes)(Double.PositiveInfinity)
    dist(0) = 0.0
    val visited = Array.fill(nodes)(false)
    val adj = Array.fill(nodes)(List.empty[(Int, Double)])
    wedges.foreach { case (u, v, w) => adj(u.toInt) ::= (v.toInt, w) }
    (0 until nodes).foreach { _ =>
      var best = -1
      (0 until nodes).foreach(i =>
        if (!visited(i) && dist(i) < Double.PositiveInfinity &&
          (best < 0 || dist(i) < dist(best))) best = i)
      if (best >= 0) {
        visited(best) = true
        adj(best).foreach { case (v, w) =>
          if (dist(best) + w < dist(v)) dist(v) = dist(best) + w
        }
      }
    }
    val got = res.distances.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0 until nodes).foreach(v =>
      assert(got(v.toLong) == dist(v), s"node $v"))
  }
}
