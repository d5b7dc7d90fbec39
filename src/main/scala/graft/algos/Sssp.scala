package graft.algos

import graft.{ConvergenceStats, SsspConfig}
import graft.graph.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-source shortest paths on directed weighted graphs.
  *
  * The reference implements delta-stepping with shared-memory buckets and
  * CAS-min relaxation (/root/reference/crates/algos/src/sssp.rs:21-204);
  * buckets are a scheduling device only — the min-plus fixed point it
  * converges to is schedule-independent (SURVEY.md §2.6). Our distributed
  * formulation is frontier-based Bellman-Ford: each round relaxes only edges
  * out of vertices whose distance improved last round (the frontier), the
  * natural Spark reading of the same fixed point:
  *
  *   dist(start)=0, dist(v)=+inf
  *   round: cand(w) = min over frontier edges (v,w) of dist(v)+weight(v,w)
  *          dist'(w) = min(dist(w), cand(w)); frontier' = improved vertices
  *   stop when the frontier is empty.
  *
  * Unreached vertices report Double.PositiveInfinity (the reference uses
  * f32::MAX, sssp.rs:12,50-52).
  */
object Sssp {

  case class Result(distances: DataFrame, stats: ConvergenceStats)

  def run(
      graph: LinkGraph,
      config: SsspConfig,
      broadcastVertices: Long = 5000000L): Result = {
    val spark = graph.edges.sparkSession
    import spark.implicits._

    val n = graph.nodeCount
    require(config.startNode >= 0 && config.startNode < n,
      s"start node ${config.startNode} out of range [0,$n)")
    val edges = graph.bySrc

    val doBroadcast = n <= broadcastVertices
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (doBroadcast) broadcast(df) else df

    // dist table holds only REACHED vertices (sparse — tiny early on).
    var dist = spark.range(1).select(
      lit(config.startNode).as("id"), lit(0.0).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var iteration = 0
    var frontierSize = 1L

    while (frontierSize > 0 && iteration < config.maxIterations) {
      val cand = edges
        .join(maybeBroadcast(frontier), edges("src") === frontier("id"))
        .groupBy(edges("dst").as("id"))
        .agg(min($"dist" + $"weight").as("cand"))
      // eager localCheckpoint truncates the per-round plan lineage
      // (SURVEY.md §7.4-5); frontier/dist are cheap views over the cached
      // RDD.
      val merged = dist.as("d").join(maybeBroadcast(cand).as("c"),
          Seq("id"), "full")
        .select($"id",
          least(coalesce($"d.dist", lit(Double.PositiveInfinity)),
            coalesce($"c.cand", lit(Double.PositiveInfinity))).as("dist"),
          ($"c.cand".isNotNull &&
            ($"d.dist".isNull || $"c.cand" < $"d.dist")).as("improved"))
        .localCheckpoint()
      frontier = merged.filter($"improved").select($"id", $"dist")
      frontierSize = frontier.count()
      dist = merged.select($"id", $"dist")
      iteration += 1
    }

    val full = graph.vertices
      .join(maybeBroadcast(dist), Seq("id"), "left")
      .select($"id",
        coalesce($"dist", lit(Double.PositiveInfinity)).as("dist"))
    Result(full,
      ConvergenceStats(iteration, frontierSize.toDouble, frontierSize == 0))
  }
}
