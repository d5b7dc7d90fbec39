package graft

import graft.algos.{LabelPropagation, PageRank, Sssp}
import graft.graph.LinkGraph
import graft.sources.EventEdges
import org.apache.spark.sql.functions._

/** Round-2 algorithm variants: delta-stepping SSSP, fused fixed-iteration
  * LP, explicit node counts, distributed relabel rank.
  */
class AlgoVariantsSpec extends SparkSpec {

  private lazy val g =
    LinkGraph(EventEdges.edges(spark, "/root/testdata/sf0.001"))

  test("SSSP with finite delta reaches the identical fixed point") {
    val inf = Sssp.run(g, SsspConfig(0L)).distances.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val banded = Sssp.run(g, SsspConfig(0L, delta = 3.0)).distances
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inf == banded)
  }

  test("SSSP batched relax rounds == unbatched, both modes (exact)") {
    // round-4 verdict #4: infinite-delta rounds now run `roundBatch` per
    // convergence-probe action. Min-plus past frontier exhaustion is a
    // no-op, so distances must be bit-identical to probe-per-round runs —
    // in broadcast mode (per-round materialization, amortized probe) AND
    // shuffle mode (lazily fused batch).
    def dist(cfg: SsspConfig, bv: Long) =
      Sssp.run(g, cfg, broadcastVertices = bv).distances.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val unbatched = dist(SsspConfig(0L, roundBatch = 1), 5000000L)
    assert(dist(SsspConfig(0L), 5000000L) == unbatched) // broadcast, auto=4
    assert(dist(SsspConfig(0L), 0L) == unbatched) // shuffle, auto=4
    assert(dist(SsspConfig(0L, roundBatch = 1), 0L) == unbatched)
  }

  test("SSSP relaxation rounds stay within the oracle's 12-step unroll") {
    // the driver oracle (SparkEntry.ssspSql) unrolls exactly 12 rounds; the
    // engine's round count IS the data's relaxation depth, so this pins the
    // fixture invariant the oracle depends on.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val res = Sssp.run(LinkGraph(EventEdges.edges(spark, dir)),
        SsspConfig(0L))
      assert(res.stats.converged &&
        res.stats.iterations <= 12,
        s"$dir: ${res.stats.iterations} rounds > oracle unroll 12")
    }
  }

  test("LP fixed-iteration mode matches earlyStop mode at convergence") {
    val a = LabelPropagation.run(g, LabelPropagationConfig(4)).labels
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LabelPropagation.run(g,
      LabelPropagationConfig(4, earlyStop = false)).labels
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("explicit nodeCount: isolated tail vertices join the universe") {
    val s = spark
    import s.implicits._
    // graph500-style: edges only among 0..2, declared node count 8
    // (Kronecker convention, reference graph500.rs:63-127) — PageRank's n,
    // init and base scores must use 8, and ids 3..7 must appear.
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0)).toDF("src", "dst",
      "weight")
    val g8 = LinkGraph(edges, nodeCount = 8L)
    assert(g8.nodeCount == 8L)
    val scores = PageRank.run(g8, PageRankConfig(3, 0.0, 0.85)).scores
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size == 8)
    assert(math.abs(scores(7L) - 0.15 / 8) < 1e-12) // isolated: base score
    val g3 = LinkGraph(edges)
    assert(g3.nodeCount == 3L) // default unchanged: max_id + 1
  }

  test("autoSalt rule: core crossover, hub threshold, factor, cap") {
    import PageRank.autoSalt
    // below the measured ~32-core crossover: never split
    assert(autoSalt(50000L, 100000L, 32, 8) == 1)
    assert(autoSalt(50000L, 100000L, 32, 31) == 1)
    // at/above the crossover: split only when the heaviest src exceeds one
    // average partition (100k rows / 32 parts = 3125)
    assert(autoSalt(3000L, 100000L, 32, 32) == 1)
    assert(autoSalt(6250L, 100000L, 32, 32) == 4) // hub spans 2 partitions
    assert(autoSalt(12500L, 100000L, 32, 64) == 8)
    // cap: a monster hub never explodes state more than 16x
    assert(autoSalt(100000L, 100000L, 32, 32) == 16)
    // degenerate inputs
    assert(autoSalt(0L, 0L, 32, 64) == 1)
  }

  test("srcHubStats reports the multigraph hub histogram") {
    val s = spark
    // fixture: src 0 has 5 distinct dsts (+1 duplicate — multiplicities
    // compress it), srcs 1..3 have one each: max = 5, total = 8
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (0L, 5L), (1L, 2L), (2L, 3L), (3L, 4L))
    val gg = LinkGraph(edgesDF(edges))
    assert(gg.srcHubStats == ((5L, 8L)))
  }

  test("shuffle-mode PageRank (virtual hub split) == broadcast mode") {
    // broadcastVertices = 0 forces the shuffle gather; gatherSalt > 1
    // routes hub srcs through virtual split ids. Scores must be identical
    // (same sums, same grouping) regardless of mode and salt.
    val cfg = PageRankConfig(5, 0.0, 0.85)
    val base = PageRank.run(g, cfg).scores.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(1, 4).foreach { s =>
      val shuffled = PageRank.run(g, cfg, broadcastVertices = 0L,
        gatherSalt = s).scores.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(shuffled.keySet == base.keySet)
      shuffled.foreach { case (id, v) =>
        assert(math.abs(v - base(id)) < 1e-12, s"salt=$s id=$id")
      }
    }
  }

  test("shuffle-mode LP (virtual hub split) == broadcast mode") {
    import graft.algos.LabelPropagation
    // same contract as the PageRank variant test: labels identical
    // regardless of gather mode and salt (round-4 verdict #6 threads the
    // salting lever through LP's own undirected multigraph).
    val cfg = LabelPropagationConfig(maxIterations = 6)
    val base = LabelPropagation.run(g, cfg).labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 4).foreach { s =>
      val shuffled = LabelPropagation.run(g, cfg, broadcastVertices = 0L,
        gatherSalt = s).labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shuffled == base, s"salt=$s")
    }
  }

  test("saltBySrc + explodeToVirtual: a GENUINE hub split preserves " +
      "gather sums") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // hub src 7 with 40 distinct dsts; normal srcs with a handful each
    val rows =
      (0L until 40L).map(d => (7L, 100L + d, 1L + (d % 3))) ++
        (0L until 5L).flatMap(s => (0L until 4L).map(d => (s, 200L + d, 1L)))
    val table = rows.toDF("src", "dst", "cnt")
    val (salted, hubs) =
      LinkGraph.saltBySrc(table, numPartitions = 4, salt = 3,
        minHubRows = 1L)
    // only src 7 exceeds the threshold; its rows land on exactly the
    // vsrc ids the state side replicates to, all negative
    assert(hubs.collect().map(_.getLong(0)).toSeq == Seq(7L))
    val hubVsrcs = salted.filter($"src" === 7L)
      .select($"vsrc").distinct().collect().map(_.getLong(0)).toSet
    assert(hubVsrcs.forall(_ < 0L) && hubVsrcs.size > 1)
    val state = (0L until 10L).map(i => (i, i * 10.0)).toDF("id", "w")
    val exploded = LinkGraph.explodeToVirtual(state, hubs, salt = 3)
    assert(exploded.filter($"id" === 7L).count() == 3)
    assert(hubVsrcs.subsetOf(exploded.filter($"id" === 7L)
      .select($"vid").collect().map(_.getLong(0)).toSet))
    // gather equivalence: sum(cnt * w) by dst identical through the split
    val direct = table.join(state, table("src") === state("id"))
      .groupBy($"dst").agg(sum($"cnt" * $"w").as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaSplit = salted
      .join(exploded, salted("vsrc") === exploded("vid"))
      .groupBy($"dst").agg(sum($"cnt" * $"w").as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSplit == direct)
  }

  test("shuffle-hash-mode SCC == broadcast mode (the 10^12-vertex path)") {
    import graft.algos.Scc
    val base = Scc.run(g).components.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val shuffled = Scc.run(g, SccConfig(), broadcastVertices = 0L)
      .components.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(shuffled == base)
  }

  test("distributed relabel rank == single-window row_number") {
    import org.apache.spark.sql.expressions.Window
    val expected = g.degrees.select(col("id"),
      (row_number().over(
        Window.orderBy(col("deg").desc, col("id").asc)) - 1)
        .cast("long").as("new_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = g.relabelMap.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
