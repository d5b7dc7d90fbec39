package graft

import graft.algos._
import graft.fixtures.Fixtures
import graft.graph.LinkGraph
import graft.ingest.TranscriptEdges

/** Golden-vector tests transcribed from the reference test corpus
  * (SURVEY.md §5.2-1). PageRank compares allclose 1e-6; WCC/TC/SSSP exact.
  */
class GoldenAlgosSpec extends SparkSpec {

  private def scoresMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("reference-parity oracle reproduces README 13-node golden vector") {
    // The pinned-iteration (10, non-converged) vector encodes the
    // reference's chunk-sequential Gauss-Seidel schedule; the parity oracle
    // reproduces it to 1e-6 (see ReferencePageRank scaladoc).
    val (scores, iters, _) = ReferencePageRank.run(13,
      Fixtures.prReadme13Edges.map { case (u, v) => (u.toInt, v.toInt) },
      PageRankConfig(10, 1e-4, 0.85))
    assert(iters == 10)
    allClose(scores.zipWithIndex
      .map { case (s, i) => i.toLong -> s.toDouble }.toMap,
      Fixtures.prReadme13Expected)
  }

  test("distributed PageRank matches reference at convergence " +
      "(README graph, via transcripts)") {
    val ts = Fixtures.transcriptsFromEdges(spark,
      Fixtures.prReadme13Edges, 13L)
    val edges = TranscriptEdges.edges(ts)
    val g = LinkGraph(edges)
    assert(g.nodeCount == 13L)
    // error shrinks ~0.85^k, so 1e-9 needs ~130 iterations
    val cfg = PageRankConfig(200, 1e-9, 0.85)
    val res = PageRank.run(g, cfg)
    assert(res.stats.converged)
    val (ref, _, _) = ReferencePageRank.run(13,
      Fixtures.prReadme13Edges.map { case (u, v) => (u.toInt, v.toInt) },
      cfg)
    allClose(scoresMap(res.scores),
      ref.map(_.toDouble).toSeq)
  }

  test("PageRank matches two-components golden vector (defaults)") {
    val g = LinkGraph(edgesDF(Fixtures.prTwoComponentsEdges))
    val res = PageRank.run(g, PageRankConfig())
    allClose(scoresMap(res.scores), Fixtures.prTwoComponentsExpected)
  }

  test("PageRank counts duplicate edges multiply and drops dangling mass") {
    // duplicate edge (0,1) twice + dangling node 2 (out_deg 0, receives).
    val g = LinkGraph(edgesDF(Seq((0L, 1L), (0L, 1L), (1L, 2L))))
    val res = PageRank.run(g, PageRankConfig(2, 0.0, 0.85))
    val m = scoresMap(res.scores)
    val n = 3.0; val base = 0.15 / n; val init = 1.0 / n
    // iter1: s0=base; s1=base+0.85*(2*(init/2)); s2=base+0.85*init
    // iter2: s2 = base + 0.85*s1_iter1
    val s1i1 = base + 0.85 * init
    assert(math.abs(m(2L) - (base + 0.85 * s1i1)) < 1e-12)
  }

  test("PageRank config semantics mirror the reference " +
      "(max_iterations / tolerance / damping)") {
    // page_rank_test.py:19-33: max_iterations=1 runs exactly one
    // superstep; a tolerance above the first iteration's L1 error stops
    // after one round (the reference uses tolerance=1 against its 256-node
    // fixture whose first error is < 1; this graph's is 1.024, so use the
    // graph-independent L1 ceiling of 2 — score mass is conserved, so
    // sum|new-old| <= 2); damping_factor=0 yields the uniform 1/n vector
    // immediately (every score = (1-d)/n with d=0).
    val g = LinkGraph(edgesDF(Fixtures.prReadme13Edges))
    val capped = PageRank.run(g, PageRankConfig(1, 1e-4, 0.85))
    assert(capped.stats.iterations == 1)
    val tol = PageRank.run(g, PageRankConfig(20, 2.0, 0.85))
    assert(tol.stats.iterations == 1 && tol.stats.converged)
    val uni = PageRank.run(g, PageRankConfig(20, 1e-4, 0.0))
    assert(uni.stats.iterations == 1 && uni.stats.converged)
    scoresMap(uni.scores).values.foreach(s =>
      assert(math.abs(s - 1.0 / 13) < 1e-12))
  }

  test("WCC two pairs -> min-id components [0,0,2,2]") {
    val ts = Fixtures.transcriptsFromEdges(spark,
      Fixtures.wccTwoPairsEdges, 4L)
    val g = LinkGraph(TranscriptEdges.edges(ts))
    val res = Wcc.run(g)
    assert(res.stats.converged)
    val m = res.components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("WCC long chain converges (pointer jumping) with min-id labels") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val g = LinkGraph(edgesDF(chain))
    val res = Wcc.run(g, WccConfig(maxIterations = 30))
    assert(res.stats.converged,
      s"chain did not converge in ${res.stats.iterations} rounds")
    assert(res.components.collect().forall(_.getLong(1) == 0L))
  }

  test("Triangle count fixtures: 2 / 2 / 2") {
    assert(TriangleCount.run(
      LinkGraph(edgesDF(Fixtures.tcTwoComponentsEdges))) == 2L)
    assert(TriangleCount.run(
      LinkGraph(edgesDF(Fixtures.tcConnectedEdges))) == 2L)
    assert(TriangleCount.run(
      LinkGraph(edgesDF(Fixtures.tcDiamondEdges))) == 2L)
  }

  test("Triangle count deduplicates and drops self-loops first") {
    val noisy = Fixtures.tcDiamondEdges ++ Seq((0L, 0L), (1L, 0L), (0L, 1L))
    assert(TriangleCount.run(LinkGraph(edgesDF(noisy))) == 2L)
  }

  test("Triangle count: adjacency-intersection formulation == wedge join") {
    // wedgeMax = 0 forces the large-graph adjacency-intersection path
    // that the size rule would otherwise never take on fixture graphs;
    // both shapes must count identically (round-6 formulation switch)
    for (edges <- Seq(Fixtures.tcTwoComponentsEdges,
        Fixtures.tcConnectedEdges, Fixtures.tcDiamondEdges)) {
      val g = LinkGraph(edgesDF(edges))
      assert(TriangleCount.run(g, wedgeMax = 0L) ==
        TriangleCount.run(g, wedgeMax = Long.MaxValue))
    }
    val g = LinkGraph(edgesDF(Fixtures.tcDiamondEdges))
    val byWedge = TriangleCount.perVertex(g, wedgeMax = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byIntersect = TriangleCount.perVertex(g, wedgeMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byIntersect == byWedge)
  }

  test("SSSP golden distances") {
    val g = LinkGraph(edgesDF(Fixtures.ssspEdges, Fixtures.ssspWeights))
    val res = Sssp.run(g, SsspConfig(startNode = 0L))
    val m = scoresMap(res.distances)
    Fixtures.ssspExpected.zipWithIndex.foreach { case (e, i) =>
      assert(m(i.toLong) == e, s"node $i: ${m(i.toLong)} != $e")
    }
  }

  test("Label propagation: two cliques joined by a bridge") {
    // cliques {0,1,2} and {3,4,5}, bridge 2-3. Sync LPA with smallest-label
    // tie-break: every member of clique A adopts 0, clique B adopts 3.
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L),
      (2L, 3L))
    val res = LabelPropagation.run(LinkGraph(edgesDF(edges)),
      LabelPropagationConfig(maxIterations = 10))
    val m = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iteration-by-iteration hand computation:
    // i1: l(0)=min-mode{1,2}=1, l(1)=mode{0,2}=0, l(2)=mode{0,1,3}=0,
    //     l(3)=mode{4,5,2}=2, l(4)=mode{3,5}=3, l(5)=mode{3,4}=3
    // i2: l(0)=mode{0,0}=0, l(1)=mode{1,0}=0, l(2)=mode{1,0,2}=0,
    //     l(3)=mode{3,3,0}=3, l(4)=mode{2,3}=2, l(5)=mode{2,3}=2
    // ... converges with clique A all 0; B oscillation bounded by max iters.
    assert(Set(m(0L), m(1L)).size == 1 || m(0L) == 0L)
    assert(m(0L) == m(1L))
  }

  test("Label propagation: star adopts hub-or-leaf deterministically") {
    // star: hub 0 with leaves 1..4. i1: hub -> mode{1,2,3,4} = 1 (tie ->
    // smallest), leaves -> 0. i2: hub -> 0, leaves -> 1. oscillates; bounded.
    // Determinism is what we assert: two runs, identical labels.
    val edges = (1L to 4L).map(v => (0L, v))
    val r1 = LabelPropagation.run(LinkGraph(edgesDF(edges)),
      LabelPropagationConfig(maxIterations = 5))
    val r2 = LabelPropagation.run(LinkGraph(edgesDF(edges)),
      LabelPropagationConfig(maxIterations = 5))
    assert(r1.labels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .sameElements(
        r2.labels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted))
  }

  test("to_undirected layout semantics mirror the reference fixture") {
    // crates/mate/tests/graph_test.py:21-54 (test_to_undirected_with_layout)
    // — a doubled edge (0,1) and an anti-parallel pair (1,2)/(2,1):
    // default/Unsorted keeps duplicates in the merged adjacency,
    // Deduplicated drops them AFTER expansion (neighbors(1) == [0,2]).
    val g = LinkGraph(edgesDF(
      Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 2L), (2L, 1L), (0L, 3L))))
    def neighbors(lg: LinkGraph): Map[Long, Seq[Long]] =
      lg.edges.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).sorted.toSeq }
    val asIs = neighbors(g.toUndirectedGraph)
    assert(asIs(0L) == Seq(1L, 1L, 2L, 3L))
    assert(asIs(1L) == Seq(0L, 0L, 2L, 2L))
    assert(asIs(2L) == Seq(0L, 1L, 1L))
    assert(asIs(3L) == Seq(0L))
    val dedup = neighbors(g.toUndirectedGraph(Layout.Deduplicated))
    assert(dedup(0L) == Seq(1L, 2L, 3L))
    assert(dedup(1L) == Seq(0L, 2L))
    assert(dedup(2L) == Seq(0L, 1L))
    assert(dedup(3L) == Seq(0L))
    // dedup keeps the MIN weight per surviving edge (deterministic on
    // weighted multigraphs — dropDuplicates would pick an arbitrary row)
    val gw = LinkGraph(edgesDF(Seq((0L, 1L), (1L, 0L)), Seq(5.0, 2.0)))
    val w = gw.toUndirectedGraph(Layout.Deduplicated).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w == Map((0L, 1L) -> 2.0, (1L, 0L) -> 2.0))
    // the DIRECTED builder's Deduplicated layout uses the same min-weight
    // rule — a weighted duplicate must resolve deterministically, and
    // identically whether the dedup ran at build time or post-expansion
    val gd = LinkGraph(
      edgesDF(Seq((0L, 1L), (0L, 1L), (2L, 2L)), Seq(5.0, 2.0, 1.0)),
      Layout.Deduplicated)
    val wd = gd.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(wd == Map((0L, 1L) -> 2.0)) // self-loop pruned, min weight kept
  }

  test("Deduplicated layouts keep self-loop-only max-id vertices counted") {
    // max_node_id derives from the RAW edge list, before any layout dedup
    // (edgelist.rs:84-90,133-136): a vertex whose only incident edge is a
    // self-loop must stay in the vertex universe even though the
    // Deduplicated layout prunes the loop from the topology.
    val in = Seq((0L, 1L), (2L, 2L))
    val g = LinkGraph(edgesDF(in), Layout.Deduplicated)
    assert(g.edges.count() == 1L) // the loop itself IS pruned
    assert(g.nodeCount == 3L) // ...but node 2 still counts
    assert(g.vertices.count() == 3L)
    // the merged-adjacency dedup on an AsIs-built graph: same rule
    val und = LinkGraph(edgesDF(in)).toUndirectedGraph(Layout.Deduplicated)
    assert(und.nodeCount == 3L)
    // a dedup-built graph's LATER derivations inherit the raw-input count
    // source even when nodeCount was never read on the parent (the lazy
    // propagation path, no memoized value to carry)
    val g2 = LinkGraph(edgesDF(in), Layout.Deduplicated)
    assert(g2.toUndirectedGraph(Layout.Deduplicated).nodeCount == 3L)
    import org.apache.spark.sql.functions.col
    assert(g2.withNodeValues(
      g2.edges.select(col("src").as("id"), col("weight")))
      .nodeCount == 3L)
    // degree-descending relabel is a permutation of the dense universe
    // (graph_ops.rs:511-638 keeps node_count): isolated vertices sort
    // LAST and appear in no relabeled edge, but their slots must survive
    assert(g.relabeledByDegree.nodeCount == 3L)
    // the ALGORITHM entry points derive the count via nodeCountFrom over a
    // checkpointed view of the PRUNED edges — countSource must win there
    // too, or WCC/SCC/LP on a dedup-built graph drop the singleton AND
    // memoize the shrunken count for every later read (round-5 review)
    val g3 = LinkGraph(edgesDF(in), Layout.Deduplicated)
    val comps = graft.algos.Wcc.run(g3).components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    assert(g3.nodeCount == 3L) // the memoized value is the raw-input count
    val g4 = LinkGraph(edgesDF(in), Layout.Deduplicated)
    val labels = graft.algos.LabelPropagation.run(g4).labels.collect()
    assert(labels.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
  }

  test("per-node neighbor accessors match the reference's el fixture") {
    // crates/mate/tests/graph_edgelist_test.py:5-24 — out_neighbors on the
    // directed el graph, merged neighbors on its undirected view
    val g = LinkGraph(edgesDF(Fixtures.elTestEdges))
    assert(g.outNeighbors(0L).toSeq == Seq(1L, 2L))
    assert(g.outNeighbors(1L).toSeq == Seq(2L, 3L))
    assert(g.outNeighbors(2L).toSeq == Seq(4L))
    assert(g.outNeighbors(3L).toSeq == Seq(4L))
    assert(g.outNeighbors(4L).toSeq == Seq.empty)
    assert(g.neighbors(0L).toSeq == Seq(1L, 2L))
    assert(g.neighbors(1L).toSeq == Seq(0L, 2L, 3L))
    assert(g.neighbors(2L).toSeq == Seq(0L, 1L, 4L))
    assert(g.neighbors(3L).toSeq == Seq(1L, 4L))
    assert(g.neighbors(4L).toSeq == Seq(2L, 3L))
    assert(g.inNeighbors(4L).toSeq == Seq(2L, 3L))
    // per-node degrees agree with the adjacency lengths
    // (numpy_neighbors_test.py:4-29)
    (0L to 4L).foreach { n =>
      assert(g.outDegreeOf(n) == g.outNeighbors(n).length)
      assert(g.inDegreeOf(n) == g.inNeighbors(n).length)
      assert(g.degreeOf(n) == g.neighbors(n).length)
    }
  }

  test("degrees: el_test graph exact out/in degrees") {
    val g = LinkGraph(edgesDF(Fixtures.elTestEdges))
    val d = g.degrees.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // out degrees (builder.rs:493-564): 0->2, 1->2, 2->1, 3->1, 4->0
    assert(d(0L) == ((2L, 0L)))
    assert(d(1L) == ((2L, 1L)))
    assert(d(2L) == ((1L, 2L)))
    assert(d(3L) == ((1L, 1L)))
    assert(d(4L) == ((0L, 2L)))
  }
}
