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

  def run(
      graph: LinkGraph,
      config: WccConfig = WccConfig(),
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 10,
      broadcastVertices: Long = 5000000L): Result = {
    val spark = graph.edges.sparkSession
    import spark.implicits._

    // ONE evaluation of the (possibly expensive, uncached) upstream edge
    // derivation: node count and the canonical set both read this
    // checkpoint (raw keeps self-loop-only vertices, so max-id is right).
    val raw = graph.edges.select($"src", $"dst")
      .transform(StatsReset.checkpointNoStats)
    val n = graph.nodeCountFrom(raw)
    require(n > 0, "WCC on empty graph")
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
    und.count()

    val doBroadcast = n <= broadcastVertices
    // broadcast when the vertex state fits; otherwise hint shuffle-hash so
    // the planner builds the (small) state side and NEVER sort-merges the
    // cached edge side (an SMJ would re-sort the big table every round)
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (doBroadcast) broadcast(df) else df.hint("shuffle_hash")

    // state-determining facts only: the comp labeling at iteration k does
    // not depend on maxIterations.
    val fingerprint = checkpointDir.map(_ =>
      s"wcc|n=$n|m=${raw.count()}").getOrElse("")
    val resume = checkpointDir
      .flatMap(Checkpointer.latest(spark, _, fingerprint))
      .filter(_._1.algorithm == "wcc")
    var iteration = resume.map(_._1.iteration).getOrElse(0)
    // Eager localCheckpoint per round: the pointer-jump self-join would
    // otherwise DOUBLE the logical plan every round (SURVEY.md §7.4-5).
    var comp: DataFrame = resume.map(_._2)
      .getOrElse(spark.range(n).select($"id", $"id".as("comp")))
      .transform(StatsReset.checkpointNoStats)

    var changed = Long.MaxValue
    while (changed > 0 && iteration < config.maxIterations) {
      val nbrMin = und
        .join(maybeBroadcast(comp), und("src") === comp("id"))
        .groupBy(und("dst").as("id"))
        .agg(min($"comp").as("nbr_min"))
      // carry the round-start comp as `prev` so the convergence check is a
      // flag-filter over the materialized state instead of a second
      // vertex-vertex join per round (round-1 verdict #6: the per-round
      // changed-count join was most of the iteration overhead).
      val propagated = comp
        .join(maybeBroadcast(nbrMin), Seq("id"), "left")
        .select($"id", $"comp".as("prev"),
          least($"comp", coalesce($"nbr_min", $"comp")).as("comp"))
      // pointer jumping: comp(v) <- comp(comp(v)); same fixed point,
      // collapses long chains logarithmically.
      val jumped = propagated.as("a")
        .join(maybeBroadcast(
          propagated.select($"id".as("jid"), $"comp".as("jcomp"))),
          $"a.comp" === $"jid", "left")
        .select($"a.id".as("id"), $"a.prev".as("prev"),
          least($"a.comp", coalesce($"jcomp", $"a.comp")).as("comp"))
        .select($"id", $"comp", ($"comp" =!= $"prev").as("chg"))
        .transform(StatsReset.checkpointNoStats)

      changed = jumped.filter($"chg").count()

      comp = jumped.select($"id", $"comp")
      iteration += 1

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
