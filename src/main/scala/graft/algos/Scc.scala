package graft.algos

import graft.{ConvergenceStats, SccConfig}
import graft.graph.LinkGraph
import org.apache.spark.sql.graft.StatsReset
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components.
  *
  * The north rule names "weakly/strongly connected components"; the
  * reference implements only the weak variant (union-find WCC,
  * /root/reference/crates/algos/src/wcc.rs:101-122), so SCC semantics are
  * fixed from first principles to mirror the WCC output contract
  * (dss.rs:183-195): every vertex is labeled with the MINIMUM vertex id of
  * its strongly connected component — mutual-reachability equivalence
  * classes, order- and partitioning-independent, hence exactly testable.
  *
  * Distributed algorithm (trim + forward/backward min-label, the
  * "coloring" family used by Pregel-style SCC):
  *
  *  1. TRIM: a vertex with no incoming or no outgoing edge inside the
  *     active subgraph cannot lie on a cycle -> it is a singleton SCC.
  *     Iterated to a fixed point this peels entire DAG regions (the outer
  *     loop's worst case) in O(peel-depth) cheap distinct+semi-join rounds.
  *  2. FORWARD labels: fwd(v) = min id over {u : u reaches v} ∪ {v},
  *     computed as min-label propagation along edges. Pointer jumping
  *     (lbl(v) <- min(lbl(v), lbl(lbl(v)))) is valid because reachability
  *     is transitive — lbl(v) reaches v and lbl(lbl(v)) reaches lbl(v).
  *     It doubles progress wherever labels form decreasing chains; when
  *     ids run against edge direction it degrades to one hop per round, so
  *     the bound is O(diameter) rounds (the standard Pregel-SCC bound —
  *     shallow on real link graphs). Rounds chain lazily in batches of 4
  *     per Spark action, so the per-round cost is a quarter of a
  *     changed-count + localCheckpoint cycle.
  *  3. BACKWARD labels: the same propagation along reversed edges,
  *     bwd(v) = min id over {u : v reaches u} ∪ {v}.
  *  4. CLAIM: fwd(v) = bwd(v) = r  <=>  v and r are mutually reachable and
  *     r is the minimum id of v's SCC (any w in SCC(v) reaches v, so
  *     r <= w). The claimed set per root r is therefore EXACTLY SCC(r).
  *  5. Remove claimed vertices and their edges; repeat. Each outer round
  *     resolves at least the SCC of every currently-minimal reachability
  *     root (the minimum active id always roots one), so rounds are bounded
  *     by the condensation's "min-chain" depth — small for real link
  *     graphs, whose condensation is shallow once TRIM peels the DAG tail.
  *
  * Every step is a Catalyst join/aggregate over the partitioned edge
  * Dataset; state is vertex-sized and checkpointed per round through
  * StatsReset.checkpointNoStats — plain localCheckpoint inherits origin
  * sizeInBytes stats, which the self-join supersteps compound
  * geometrically until stats estimation dominates the driver (see
  * org.apache.spark.sql.graft.StatsReset). Durable checkpoint/resume via
  * `checkpointDir` writes the total labeling (resolved labels + -1
  * sentinel for active vertices) once per outer round.
  */
object Scc {

  case class Result(components: DataFrame, stats: ConvergenceStats)

  def run(
      graph: LinkGraph,
      config: SccConfig = SccConfig(),
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 1,
      broadcastVertices: Long = 5000000L): Result = {
    val spark = graph.edges.sparkSession
    import spark.implicits._

    // ONE evaluation of the (possibly expensive, uncached) upstream edge
    // derivation: node count, vertex universe, and the simple directed
    // edge set below all derive from this checkpoint instead of re-running
    // the derivation per consumer.
    val raw = graph.edges.select($"src", $"dst")
      .transform(StatsReset.checkpointNoStats)
    val n = graph.nodeCountFrom(raw)
    require(n > 0, "SCC on empty graph")
    // one count over the checkpointed RDD (cheap); drives the batch policy
    val rawEdgeCount = raw.count()
    val debug = sys.env.get("GRAFT_SCC_DEBUG").contains("1")
    val doBroadcast = n <= broadcastVertices
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (doBroadcast) broadcast(df) else df.hint("shuffle_hash")

    // Min-label propagation along `edges` (label flows src -> dst) to the
    // fixed point lbl(v) = min id over in-reachers of v, with pointer
    // jumping, `batch` lazily-chained rounds per action (scaladoc step 2).
    // Returns (labels, reachedFixedPoint): the claim step is only sound at
    // the fixed point — claiming from capped labels can split an SCC whose
    // ids run against edge direction across different roots (so callers
    // must NOT claim when reachedFixedPoint is false).
    def propagateMin(verts: DataFrame,
        edges: DataFrame): (DataFrame, Boolean) = {
      // Lazy chaining pays ONLY in shuffle mode (one fused job, exchanges
      // reused); in broadcast mode each nested broadcast build re-executes
      // its subtree with no cross-build reuse — ~2^batch per action, the
      // same pathology WCC measured (Wcc.scala batch policy). Round 3
      // exempted "small" (<= 4M-edge) broadcast sets from that rule; round
      // 4 re-measured and the exemption was wrong at every scale tried
      // (sf0.1 events: 7.8 s at batch=1 vs 19.6 s at batch=4 end-to-end).
      val batch = sys.env.get("GRAFT_SCC_BATCH").map(_.toInt)
        .orElse(Some(config.propagationBatch).filter(_ > 0))
        .getOrElse(if (!doBroadcast) 4 else 1)
      // trivial lineage (projection over the checkpointed active set) —
      // no checkpoint needed before the first batch materializes
      var lbl = verts.select($"id", $"id".as("lbl"))
      var changed = Long.MaxValue
      var rounds = 0
      var batches = 0
      while (changed > 0 && rounds < config.maxPropagationRounds) {
        // the budget counts ROUNDS (min-label hops), not batches — so the
        // mode-dependent batch size (4 in shuffle, 1 in broadcast) cannot
        // silently scale the effective hop budget 4x between modes
        // (round-4 advice: the batch default dropping 4 -> 1 shrank the
        // broadcast-mode budget from 800 to 200 hops unannounced)
        val thisBatch = math.min(batch, config.maxPropagationRounds - rounds)
        val start = lbl.select($"id", $"lbl".as("prev"))
        var cur = lbl
        for (i <- 0 until thisBatch) {
          val nbrMin = edges
            .join(maybeBroadcast(cur), edges("src") === cur("id"))
            .groupBy(edges("dst").as("id"))
            .agg(min($"lbl").as("nbr_min"))
          val prop = cur
            .join(maybeBroadcast(nbrMin), Seq("id"), "left")
            .select($"id",
              least($"lbl", coalesce($"nbr_min", $"lbl")).as("lbl"))
          val a = s"a$i" // unique alias per unrolled round (nested scopes)
          cur = prop.as(a)
            .join(maybeBroadcast(
              prop.select($"id".as("jid"), $"lbl".as("jlbl"))),
              col(s"$a.lbl") === $"jid", "left")
            .select(col(s"$a.id").as("id"),
              least(col(s"$a.lbl"), coalesce($"jlbl", col(s"$a.lbl")))
                .as("lbl"))
        }
        val stepped = cur.join(maybeBroadcast(start), Seq("id"))
          .select($"id", $"lbl", ($"lbl" =!= $"prev").as("chg"))
          .transform(StatsReset.checkpointNoStats)
        changed = stepped.filter($"chg").count()
        lbl = stepped.select($"id", $"lbl")
        rounds += thisBatch
        batches += 1
        if (debug) {
          val sz = lbl.queryExecution.optimizedPlan.stats.sizeInBytes
          println(s"[scc] propagate batch=$batches changed=$changed " +
            s"t=${System.nanoTime() / 1000000000L % 10000} " +
            s"statsDigits=${sz.toString.length}")
        }
      }
      (lbl, changed == 0)
    }

    // Connectivity ignores weights, multiplicity, and self-loops.
    var activeEdges = raw
      .where($"src" =!= $"dst").distinct()
      .repartition(graph.numPartitions, $"src")
      .transform(StatsReset.checkpointNoStats)
    // graph-partition-count slices (round-6): the active set seeds every
    // trim/propagation state; a 32-slice default re-inflates each of the
    // many per-round jobs to 32 tasks after adaptiveParts sized the graph
    var active = spark.range(0, n, 1, graph.numPartitions).toDF("id")
    var remaining = n

    // Restrict the edge set to the surviving vertex set; one eager
    // localCheckpoint (single action) instead of a repartition+persist
    // cycle per peel. The src-side semi-join runs LAST so in shuffle-hash
    // mode the output keeps hash(src) partitioning for the next
    // propagation's gather (broadcast mode is partitioning-agnostic).
    def restrict(edges: DataFrame, verts: DataFrame): DataFrame =
      edges
        .join(maybeBroadcast(verts.select($"id".as("dst"))),
          Seq("dst"), "left_semi")
        .join(maybeBroadcast(verts.select($"id".as("src"))),
          Seq("src"), "left_semi")
        .select($"src", $"dst")
        .transform(StatsReset.checkpointNoStats)

    val resolved = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var iteration = 0

    // Checkpoint state = one total labeling DataFrame: resolved vertices
    // carry their final scc label, still-active vertices the sentinel -1.
    // Written once per `checkpointEvery` outer rounds (outer rounds are
    // few and expensive — the natural durability granularity); resume
    // splits the latest state back into resolved/active and restricts the
    // edge set (north rule §4.8; same fingerprint guard as PR/WCC/LP).
    val fingerprint = checkpointDir.map(_ =>
      s"scc|n=$n|m=$rawEdgeCount").getOrElse("")
    val resume = checkpointDir
      .flatMap(graft.checkpoint.Checkpointer.latest(spark, _, fingerprint))
      .filter(_._1.algorithm == "scc")
    resume.foreach { case (meta, st) =>
      iteration = meta.iteration
      resolved += st.filter($"scc" >= 0).select($"id", $"scc")
      active = st.filter($"scc" === -1).select($"id")
      remaining = active.count()
      if (remaining > 0) activeEdges = restrict(activeEdges, active)
    }

    while (remaining > 0 && iteration < config.maxIterations) {
      // ---- TRIM to fixed point (one checkpoint + one count per peel:
      // flag every active vertex with has-in AND has-out, then read both
      // the survivors and the trimmed singletons off the materialized df)
      var trimming = true
      while (trimming && remaining > 0) {
        val flagged = active
          .join(activeEdges.select($"src".as("id"), lit(true).as("has_out"))
            .dropDuplicates("id"), Seq("id"), "left")
          .join(activeEdges.select($"dst".as("id"), lit(true).as("has_in"))
            .dropDuplicates("id"), Seq("id"), "left")
          .select($"id",
            ($"has_out".isNotNull && $"has_in".isNotNull).as("keep"))
          .transform(StatsReset.checkpointNoStats)
        val tCount = flagged.filter(!$"keep").count()
        if (debug) println(s"[scc] outer=$iteration trim=$tCount " +
          s"remaining=$remaining")
        if (tCount == 0) trimming = false
        else {
          resolved += flagged.filter(!$"keep")
            .select($"id", $"id".as("scc"))
          active = flagged.filter($"keep").select($"id")
          remaining -= tCount
          if (remaining > 0) activeEdges = restrict(activeEdges, active)
        }
      }

      if (remaining > 0) {
        // ---- forward/backward labels + claim; the two propagations are
        // independent fixed points over the same edge set, so their jobs
        // run CONCURRENTLY (Spark schedules parallel actions freely) and
        // the phase's wall time is max, not sum, of the two.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fwdF = Future(propagateMin(active, activeEdges))
        val bwdF = Future(propagateMin(active,
          activeEdges.select($"dst".as("src"), $"src".as("dst"))))
        val (fwd, fwdFixed) = Await.result(fwdF, Duration.Inf)
        val (bwd, bwdFixed) = Await.result(bwdF, Duration.Inf)
        if (!fwdFixed || !bwdFixed) {
          // Propagation hit maxPropagationRounds before the fixed point
          // (e.g. a cycle whose ids run against edge direction needs ~n
          // one-hop rounds). Claiming now could split an SCC across roots;
          // re-running next outer round would repeat the identical capped
          // propagation, so abort instead — the fail-safe below labels the
          // unresolved actives and reports converged=false honestly.
          if (debug) println(s"[scc] outer=$iteration propagation CAPPED " +
            s"(fwd=$fwdFixed bwd=$bwdFixed) — aborting without claims")
          iteration = config.maxIterations
        } else {
          val claimed = fwd
            .join(bwd.withColumnRenamed("lbl", "blbl"), Seq("id"))
            .where($"lbl" === $"blbl")
            .select($"id", $"lbl".as("scc"))
            .transform(StatsReset.checkpointNoStats)
          val cCount = claimed.count()
          if (debug) println(s"[scc] outer=$iteration claimed=$cCount " +
            s"remaining=${remaining - cCount}")
          resolved += claimed
          remaining -= cCount
          if (remaining > 0) {
            active = active.join(claimed.select($"id"), Seq("id"),
              "left_anti").transform(StatsReset.checkpointNoStats)
            activeEdges = restrict(activeEdges, active)
          }
        }
      }
      if (iteration < config.maxIterations) iteration += 1

      if (checkpointDir.isDefined && remaining > 0 && resolved.nonEmpty
          && iteration % checkpointEvery == 0) {
        val state = resolved.reduce(_ union _)
          .union(active.select($"id", lit(-1L).as("scc")))
        val reread = graft.checkpoint.Checkpointer.write(checkpointDir.get,
          "scc", iteration, remaining.toDouble, state, fingerprint)
        resolved.clear()
        resolved += reread.filter($"scc" >= 0).select($"id", $"scc")
        active = reread.filter($"scc" === -1).select($"id")
      }
    }

    val converged = remaining == 0
    // Iteration-cap fail-safe (unreachable at default caps): surface the
    // unresolved vertices as self-labeled so output stays total, and report
    // converged=false.
    if (!converged) resolved += active.select($"id", $"id".as("scc"))

    // parts are checkpointed; the union's lineage is already shallow
    val components = resolved.reduce(_ union _)
      .repartition(graph.numPartitions, $"id")
    Result(components, ConvergenceStats(iteration, remaining.toDouble,
      converged))
  }
}
