package graft.algos

import graft.{ConvergenceStats, PageRankConfig}
import graft.checkpoint.Checkpointer
import graft.graph.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank re-expressed as synchronous (Jacobi) supersteps of
  * Catalyst-planned join + aggregate, matching the recurrence of the
  * reference's pull-based implementation
  * (/root/reference/crates/algos/src/page_rank.rs:58-167):
  *
  *   init_score = 1/n; base = (1-d)/n
  *   score'(u)  = base + d * sum over in-neighbors v of score(v)/out_deg(v)
  *   error      = sum_u |score'(u) - score(u)|   (accumulated in f64)
  *   stop when error < tolerance or iteration == max_iterations
  *
  * Exact semantic contract (SURVEY.md §2.2): duplicate edges contribute once
  * per occurrence (the reference gathers the raw in-neighbor multiset);
  * dangling mass is dropped, NOT redistributed (an out-degree-0 node sends
  * nothing); scores do not sum to 1; the vertex universe is 0..max_id even
  * for ids absent from the edge list. The reference's chunk-sequential
  * intra-iteration updates are schedule-dependent at the last f32 bits; our
  * strictly synchronous Double iteration is the deterministic reading of the
  * same recurrence and matches the golden vectors well within the 1e-6
  * allclose contract.
  *
  * Physical plan per superstep: edges pre-hash-partitioned by src and cached
  * (InMemoryRelation preserves outputPartitioning, so the big side is never
  * reshuffled across iterations) join the vertex-state table (broadcast when
  * below `broadcastVertices`, shuffled-with-AQE otherwise), then
  * groupBy(dst).sum — partial map-side aggregation absorbs dst-hub skew
  * before the shuffle, the distributed counterpart of the reference's
  * degree-balanced work ranges (graph_ops.rs:331-440). Every
  * `checkpointEvery` iterations state is written + re-read via Checkpointer,
  * truncating plan lineage and enabling mid-sequence crash-resume.
  */
object PageRank {

  case class Result(scores: DataFrame, stats: ConvergenceStats)

  def run(
      graph: LinkGraph,
      config: PageRankConfig = PageRankConfig(),
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 5,
      broadcastVertices: Long = 5000000L): Result = {
    val spark = graph.edges.sparkSession
    import spark.implicits._

    val n = graph.nodeCount
    require(n > 0, "PageRank on empty graph")
    val d = config.dampingFactor
    val initScore = 1.0 / n
    val baseScore = (1.0 - d) / n

    val edges = graph.bySrc
    // Dense (id, out_deg) over the full vertex universe — built once.
    val degrees = graph.vertices
      .join(edges.groupBy($"src".as("id"))
        .agg(count(lit(1)).cast("double").as("out_deg")), Seq("id"), "left")
      .na.fill(0.0, Seq("out_deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    degrees.count()

    val doBroadcast = n <= broadcastVertices
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (doBroadcast) broadcast(df) else df

    val resume = checkpointDir.flatMap(Checkpointer.latest(spark, _))
      .filter(_._1.algorithm == "page_rank")
    var iteration = resume.map(_._1.iteration).getOrElse(0)
    // localCheckpoint (eager) after every superstep truncates the logical
    // plan — persist alone caches data but lineage still nests per
    // iteration and plan analysis blows up (SURVEY.md §7.4-5).
    var state: DataFrame = resume.map(_._2.select($"id", $"score"))
      .getOrElse(degrees.select($"id", lit(initScore).as("score")))
      .localCheckpoint()

    var error = Double.MaxValue
    var converged = false

    while (!converged && iteration < config.maxIterations) {
      // senders = vertices with out_deg > 0; out_scores = score/out_deg
      // precomputed once per superstep (reference P7, page_rank.rs:75-79).
      val senders = state.join(degrees.filter($"out_deg" > 0), Seq("id"))
        .select($"id", ($"score" / $"out_deg").as("out_score"))
      val gathered = edges
        .join(maybeBroadcast(senders), edges("src") === senders("id"))
        .groupBy(edges("dst").as("id"))
        .agg(sum($"out_score").as("in_sum"))
      val next = degrees
        .join(maybeBroadcast(gathered), Seq("id"), "left")
        .select($"id",
          (lit(baseScore) + lit(d) * coalesce($"in_sum", lit(0.0)))
            .as("score"))
        .localCheckpoint()

      error = next.as("n").join(state.as("p"), Seq("id"))
        .agg(sum(abs($"n.score" - $"p.score"))).first().getDouble(0)

      state = next
      iteration += 1
      converged = error < config.tolerance

      if (checkpointDir.isDefined && !converged
          && iteration < config.maxIterations
          && iteration % checkpointEvery == 0) {
        state = Checkpointer.write(checkpointDir.get, "page_rank",
          iteration, error, state).localCheckpoint()
      }
    }

    Result(state, ConvergenceStats(iteration, error, converged))
  }
}
