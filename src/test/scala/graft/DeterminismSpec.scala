package graft

import graft.algos._
import graft.fixtures.Fixtures
import graft.graph.LinkGraph

/** Determinism across partitionings (SURVEY.md §5.2-5): same input at
  * different partition counts must give identical WCC/LP/TC outputs and
  * PageRank within 1e-9 (Double sums over canonical groupings; tolerance
  * guards reduction-order bits).
  */
class DeterminismSpec extends SparkSpec {

  private val edges = Fixtures.randomEdges(150, 900, seed = 11L)

  private def graphWith(parts: Int): LinkGraph =
    LinkGraph(edgesDF(edges).repartition(parts), numPartitions = parts)

  test("WCC identical at 2 vs 16 partitions") {
    val a = Wcc.run(graphWith(2)).components.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Wcc.run(graphWith(16)).components.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("LP identical at 2 vs 16 partitions") {
    val cfg = LabelPropagationConfig(6)
    val a = LabelPropagation.run(graphWith(2), cfg).labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = LabelPropagation.run(graphWith(16), cfg).labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("SCC identical at 2 vs 16 partitions") {
    val a = Scc.run(graphWith(2)).components.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Scc.run(graphWith(16)).components.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("TC identical at 2 vs 16 partitions") {
    assert(TriangleCount.run(graphWith(2)) ==
      TriangleCount.run(graphWith(16)))
  }

  test("PageRank within 1e-9 at 2 vs 16 partitions") {
    val cfg = PageRankConfig(10, 0.0, 0.85)
    val a = PageRank.run(graphWith(2), cfg).scores.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(graphWith(16), cfg).scores.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) <= 1e-9, s"node $k: $v vs ${b(k)}") }
  }

  test("SSSP identical at 2 vs 16 partitions (integer weights)") {
    val wedges = edges.zipWithIndex.map { case ((u, v), i) =>
      (u, v, 1.0 + (i % 5)) }
    def g(parts: Int) = LinkGraph(
      edgesDF(wedges.map(e => (e._1, e._2)), wedges.map(_._3))
        .repartition(parts), numPartitions = parts)
    val a = Sssp.run(g(2), SsspConfig(0L)).distances.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val b = Sssp.run(g(16), SsspConfig(0L)).distances.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(a == b)
  }
}
