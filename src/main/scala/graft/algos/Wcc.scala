package graft.algos

import graft.{ConvergenceStats, WccConfig}
import graft.checkpoint.Checkpointer
import graft.graph.LinkGraph
import org.apache.spark.sql.graft.StatsReset
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weakly connected components as an iterative hash-min fixed point.
  *
  * The reference computes WCC with a shared-memory union-find using
  * union-by-min ("smaller set id wins",
  * /root/reference/crates/algos/src/dss.rs:38-62): at convergence every
  * node's component id is the MINIMUM node id of its component
  * (dss.rs:183-195). Union-find does not distribute; the equivalent
  * distributed fixed point is min-label propagation over the undirected
  * view of the raw edges (the reference unions across out- AND in-neighbors,
  * wcc.rs:274-301 — i.e. weak connectivity):
  *
  *   comp(v) <- min(comp(v), min over neighbors u of comp(u))
  *
  * which converges to exactly the same labeling (per-component min id) and is
  * order/partitioning independent — so "exact match" vs the reference is
  * well-defined (SURVEY.md §2.3). The Afforest variants (wcc.rs:158-301) are
  * shared-memory work-skipping optimizations with identical output; they are
  * not semantics we need to reproduce.
  *
  * Pointer-jumping acceleration: plain hash-min needs O(diameter) rounds; we
  * add a shortcutting round (comp <- comp of comp) after each propagation,
  * the "small-star-ish" move of Kiveris et al. (2014), which keeps the same
  * fixed point while collapsing chains in O(log d) rounds. Each round is one
  * join + min-aggregate over edges (partial aggregation handles hub skew)
  * plus one vertex-sized self-join for the shortcut.
  */
object Wcc {

  case class Result(components: DataFrame, stats: ConvergenceStats)

  /** AUTO contraction engages after this many hash-min+jump rounds — the
    * measured sweet spot on the 112M-edge bench graph (BASELINE.md:
    * contraction after round 2 beat both plain and earlier contraction;
    * rounds 1-2 settle the bulk of a power-law graph into its giant
    * component, Afforest's own observation, wcc.rs:158-301).
    */
  val AutoContractRound = 2

  /** AUTO-mode engagement rule (config.contractAfter < 0), evaluated at
    * each convergence check: contract when (a) the decision round is
    * reached, (b) the state is large enough that full-graph rounds are the
    * dominant cost (below `minState` the contraction's own jobs cost more
    * than the rounds they skip — toy graphs stay on the plain path), and
    * (c) ANY work remains. No changed-fraction condition, deliberately: a
    * plain hash-min round scans the FULL undirected edge set no matter how
    * few labels still move (measured on the 112M-edge bench graph: round 2
    * leaves 4,836 of 1.9M vertices moving — 0.25% — yet rounds 3-4 still
    * cost full scans, and contracting exactly there was the measured 74.5
    * -> 68.4 s win). That full-scan-regardless-of-progress cost is the
    * problem Afforest exists to skip, and why the reference runs it
    * UNCONDITIONALLY as its default (app.rs:15). Worst case (the fixed
    * point would have finished next round) contraction trades one full
    * edge scan for the contraction build — a wash; every earlier finish is
    * a win that grows with remaining rounds. Pure so the rule itself is
    * unit-testable.
    */
  def autoEngage(iteration: Int, stateRows: Long, changed: Long,
      minState: Long): Boolean =
    iteration >= AutoContractRound && stateRows >= minState && changed > 0L

  /** @param sparseVertices when true, the component state is initialized
    *   from the CANONICAL edge endpoints only instead of the dense 0..n-1
    *   universe — vertices with no incident edge are absent from the
    *   output, and so is a vertex whose ONLY incident edges are self-loops
    *   (the canonical set drops self-loops before the endpoints are
    *   collected; dense mode labels such a vertex as its own singleton).
    *   The caller unions absent ids back as singletons if it needs them —
    *   coalesce(comp, id) is correct for both absence classes. This is
    *   the right shape when the edge set is far smaller than the id space:
    *   e.g. near-dup closure over an LSH pair graph iterates a pair-sized
    *   fixed point instead of billions of untouched singleton rows
    *   (round-2 verdict #2).
    */
  def run(
      graph: LinkGraph,
      config: WccConfig = WccConfig(),
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 10,
      broadcastVertices: Long = 5000000L,
      sparseVertices: Boolean = false,
      autoContractMinState: Long = 100000L): Result = {
    val spark = graph.edges.sparkSession
    import spark.implicits._

    // ONE evaluation of the (possibly expensive, uncached) upstream edge
    // derivation: node count and the canonical set both read this
    // checkpoint (raw keeps self-loop-only vertices, so max-id is right).
    val raw = graph.edges.select($"src", $"dst")
      .transform(StatsReset.checkpointNoStats)
    // sparse mode never materializes the dense universe, so the (possibly
    // astronomically large) max-id+1 is only computed for the fingerprint
    // and the broadcast decision when a checkpoint dir is in play.
    val n = if (sparseVertices) -1L else graph.nodeCountFrom(raw)
    require(sparseVertices || n > 0, "WCC on empty graph")
    // Undirected simple view: duplicates are idempotent under min, drop them
    // once up front to shrink the join input; self-loops are no-ops.
    // Checkpoint the canonical set BEFORE the union: both union branches
    // reference it, so it would otherwise compute twice during the persist
    // materialization (e.g. the LSH pair pipeline in Dedup.dupGroups).
    val canon = raw.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("src"),
        greatest($"src", $"dst").as("dst"))
      .distinct()
      .transform(StatsReset.checkpointNoStats)
    val und = canon
      .union(canon.select($"dst".as("src"), $"src".as("dst")))
      .repartition(graph.numPartitions, $"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val undCount = und.count()

    // sparse mode has no n; its state size is bounded by the endpoint count
    // (<= undirected edge count), so gate the broadcast on that instead.
    val doBroadcast =
      if (sparseVertices) undCount <= broadcastVertices
      else n <= broadcastVertices
    // broadcast when the vertex state fits; otherwise hint shuffle-hash so
    // the planner builds the (small) state side and NEVER sort-merges the
    // cached edge side (an SMJ would re-sort the big table every round)
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (doBroadcast) broadcast(df) else df.hint("shuffle_hash")

    // state-determining facts only: the comp labeling at iteration k does
    // not depend on maxIterations.
    val fingerprint = checkpointDir.map(_ =>
      s"wcc|n=$n|m=${raw.count()}|sparse=$sparseVertices").getOrElse("")
    val resume = checkpointDir
      .flatMap(Checkpointer.latest(spark, _, fingerprint))
      .filter(_._1.algorithm == "wcc")
    // a TERMINAL checkpoint (the contraction branch's composed labeling)
    // is final state: return it directly — re-entering the loop would
    // skip the confirming round when iteration >= maxIterations and
    // misreport a finished run as converged=false
    resume.filter(_._1.converged).foreach { case (meta, state) =>
      und.unpersist()
      return Result(state.transform(StatsReset.checkpointNoStats),
        ConvergenceStats(meta.iteration, 0.0, converged = true))
    }
    var iteration = resume.map(_._1.iteration).getOrElse(0)
    // Eager localCheckpoint per round: the pointer-jump self-join would
    // otherwise DOUBLE the logical plan every round (SURVEY.md §7.4-5).
    var comp: DataFrame = resume.map(_._2)
      .getOrElse {
        if (sparseVertices)
          // edge endpoints only — a pair-sized state, never the id space
          canon.select($"src".as("id"))
            .union(canon.select($"dst".as("id")))
            .distinct()
            .select($"id", $"id".as("comp"))
        // graph-partition-count slices, not the 32-slice session default:
        // every round job runs one task per state partition (round-6)
        else spark.range(0, n, 1, graph.numPartitions)
          .select($"id", $"id".as("comp"))
      }
      .transform(StatsReset.checkpointNoStats)

    // Rounds chain LAZILY in batches of up to 4 per Spark action — but
    // ONLY in shuffle mode, where the whole batch fuses into one job and
    // ReuseExchange dedupes every repeated subtree (the PageRank
    // fixed-iteration pattern that scales 0.95 on the N->4N gate). In
    // BROADCAST mode each nested broadcast is built by its own driver job
    // that re-executes its lazy subtree, and those builds are NOT reused
    // across each other — measured cost ~2^batch per action (sf0.1 events:
    // 3.5 s/round at batch=1 vs 8.5 s/round at batch=4, and 33 min/run on
    // a 77M-row und at 2M vertices; disabling AQE only shrinks the
    // multiplier to ~2.4 s/round, still no better than unbatched with
    // round-granular convergence detection). So broadcast mode stays at
    // one materialized round per action.
    val batch =
      sys.env.get("GRAFT_WCC_BATCH").map(_.toInt).getOrElse(
        if (doBroadcast) 1 else 4)
    // AUTO mode clamps the first batch to the decision round so the
    // engagement rule is evaluated exactly where the measured win was
    // (after round 2), not wherever the batch boundary happens to fall.
    val contractAt =
      if (config.contractAfter < 0) AutoContractRound
      else config.contractAfter
    var changed = Long.MaxValue
    while (changed > 0 && iteration < config.maxIterations) {
      var rounds = math.min(batch, config.maxIterations - iteration)
      if (contractAt > iteration)
        rounds = math.min(rounds, contractAt - iteration)
      // batch-start comp rides along as `prev` so the convergence check is
      // a flag-filter over the materialized state (round-1 verdict #6), now
      // amortized over the whole batch.
      var cur = comp.select($"id", $"comp", $"comp".as("prev"))
      for (i <- 0 until rounds) {
        val nbrMin = und
          .join(maybeBroadcast(cur.select($"id", $"comp")),
            und("src") === cur("id"))
          .groupBy(und("dst").as("id"))
          .agg(min($"comp").as("nbr_min"))
        val propagated = cur
          .join(maybeBroadcast(nbrMin), Seq("id"), "left")
          .select($"id", $"prev",
            least($"comp", coalesce($"nbr_min", $"comp")).as("comp"))
        // pointer jumping: comp(v) <- comp(comp(v)); same fixed point,
        // collapses long chains logarithmically.
        val a = s"w$i" // unique alias per unrolled round (nested scopes)
        cur = propagated.as(a)
          .join(maybeBroadcast(
            propagated.select($"id".as("jid"), $"comp".as("jcomp"))),
            col(s"$a.comp") === $"jid", "left")
          .select(col(s"$a.id").as("id"), col(s"$a.prev").as("prev"),
            least(col(s"$a.comp"), coalesce($"jcomp", col(s"$a.comp")))
              .as("comp"))
      }
      val stepped = cur
        .select($"id", $"comp", ($"comp" =!= $"prev").as("chg"))
        .transform(StatsReset.checkpointNoStats)

      // ONE action per batch serves both the convergence check and the
      // auto-contraction rule: total state rows + changed rows.
      val counts = stepped
        .agg(count(lit(1)), count(when($"chg", lit(1)))).first()
      val stateRows = counts.getLong(0)
      changed = counts.getLong(1)

      comp = stepped.select($"id", $"comp")
      iteration += rounds

      val wantContract =
        if (config.contractAfter < 0)
          autoEngage(iteration, stateRows, changed, autoContractMinState)
        else config.contractAfter > 0 && iteration >= config.contractAfter
      if (sys.env.contains("GRAFT_WCC_DEBUG"))
        System.err.println(s"[wcc] iter=$iteration state=$stateRows " +
          s"changed=$changed sparse=$sparseVertices contract=$wantContract")
      if (wantContract && changed > 0
          && iteration < config.maxIterations) {
        // Afforest-analogue work skipping by CONTRACTION (see WccConfig):
        // rebuild the graph over label-classes and recurse on it. changed>0
        // guarantees comp is non-injective (an injective pointwise-
        // non-increasing self-map of a finite id set is the identity), so
        // the contracted vertex set strictly shrinks — termination. A
        // label-class edge (comp(u), comp(v)) exists iff some edge joins
        // the classes, so contracted components = original components over
        // classes; every vertex is connected to its label (propagation
        // follows real paths), so composing labelings preserves both
        // components and the min-id contract (the component min M always
        // has comp(M)=M and so survives contraction as a class vertex).
        val contracted = canon
          .join(maybeBroadcast(
            comp.select($"id".as("src"), $"comp".as("csrc"))), Seq("src"))
          .join(maybeBroadcast(
            comp.select($"id".as("dst"), $"comp".as("cdst"))), Seq("dst"))
          .where($"csrc" =!= $"cdst")
          .select($"csrc".as("src"), $"cdst".as("dst"),
            lit(1.0).as("weight"))
        val sub = run(
          LinkGraph(contracted, numPartitions = graph.numPartitions),
          config, checkpointDir = None,
          broadcastVertices = broadcastVertices,
          // class labels are sparse in the id space — never densify
          sparseVertices = true,
          autoContractMinState = autoContractMinState)
        val composed0 = comp
          .join(maybeBroadcast(sub.components
            .select($"id".as("comp"), $"comp".as("fin"))), Seq("comp"),
            "left")
          .select($"id", coalesce($"fin", $"comp").as("comp"))
          .transform(StatsReset.checkpointNoStats)
        val totalIters = iteration + sub.stats.iterations
        // Round-4 verdict #7: this branch RETURNS — without a durable write
        // a crash after a long contracted run would resume from round
        // <= contractAt. The composed labeling is the final state, so write
        // it as the terminal checkpoint (resume then costs one confirming
        // round that observes changed == 0).
        // converged=true marks the checkpoint TERMINAL: a resume returns
        // it directly instead of re-entering the loop — which would
        // silently report converged=false whenever totalIters already
        // reached maxIterations (the loop guard skips the confirming
        // round entirely in that case)
        val composed =
          if (checkpointDir.isDefined)
            Checkpointer.write(checkpointDir.get, "wcc", totalIters, 0.0,
              composed0, fingerprint, converged = sub.stats.converged)
              .transform(StatsReset.checkpointNoStats)
          else composed0
        und.unpersist()
        return Result(composed, ConvergenceStats(
          totalIters, 0.0, sub.stats.converged))
      }

      if (checkpointDir.isDefined && changed > 0
          && iteration % checkpointEvery == 0) {
        comp = Checkpointer.write(checkpointDir.get, "wcc",
          iteration, changed.toDouble, comp, fingerprint).transform(StatsReset.checkpointNoStats)
      }
    }

    und.unpersist()
    Result(comp, ConvergenceStats(iteration, changed.toDouble, changed == 0))
  }
}
