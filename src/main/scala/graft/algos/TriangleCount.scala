package graft.algos

import graft.graph.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact global triangle count.
  *
  * The reference counts each triangle once via the ordering u > v > w with
  * merge-intersection of sorted adjacency lists on a deduplicated,
  * self-loop-free undirected CSR
  * (/root/reference/crates/algos/src/triangle_count.rs:22-86), after an
  * optional degree-descending relabel that tames hub intersections
  * (triangle_count.rs:12-20, graph_ops.rs:511-638).
  *
  * Distributed formulation: orient every undirected edge from the
  * lower-(degree, id) endpoint to the higher one — the direct analogue of the
  * degree relabel (SURVEY.md §2.5) — then count wedges closed by an oriented
  * edge with two joins:
  *
  *   oriented(a,b): deg(a) < deg(b) or (deg(a)==deg(b) and a < b)
  *   wedges  = oriented as e1 join oriented as e2 on e1.dst = e2.src
  *   triangles = wedges join oriented as e3
  *       on e1.src = e3.src and e2.dst = e3.dst
  *
  * Orientation bounds each vertex's oriented out-degree by O(sqrt(m)), so
  * the wedge join cannot explode on hubs — this is what makes the plan
  * survive at 100TB where the naive src<dst orientation would square the
  * max hub degree. Counts are exact and identical to the reference on the
  * Deduplicated layout (its correctness precondition, SURVEY.md §7.4-3).
  */
object TriangleCount {

  /** Oriented edge table (each undirected simple edge exactly once, pointing
    * low-degree -> high-degree).
    */
  def orientedEdges(graph: LinkGraph): DataFrame = {
    val spark = graph.edges.sparkSession
    import spark.implicits._
    // (src < dst), dedup, no loops — checkpointed once: the degree and
    // orientation branches below reference it three times, and the
    // upstream derivation is not cached
    val simple = org.apache.spark.sql.graft.StatsReset
      .checkpointNoStats(graph.canonicalUndirected)
    // undirected degree over the simple graph
    val deg = simple.select($"src".as("id"))
      .union(simple.select($"dst".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))
    val withDeg = simple
      .join(deg.withColumnRenamed("id", "src")
        .withColumnRenamed("deg", "sdeg"), Seq("src"))
      .join(deg.withColumnRenamed("id", "dst")
        .withColumnRenamed("deg", "ddeg"), Seq("dst"))
    withDeg.select(
      when($"sdeg" < $"ddeg" ||
        ($"sdeg" === $"ddeg" && $"src" < $"dst"), $"src")
        .otherwise($"dst").as("a"),
      when($"sdeg" < $"ddeg" ||
        ($"sdeg" === $"ddeg" && $"src" < $"dst"), $"dst")
        .otherwise($"src").as("b"))
  }

  def run(graph: LinkGraph): Long = {
    val spark = graph.edges.sparkSession
    import spark.implicits._
    val oriented = orientedEdges(graph)
      .repartition(graph.numPartitions, $"a")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val e1 = oriented.select($"a".as("u"), $"b".as("v"))
      val e2 = oriented.select($"a".as("v"), $"b".as("w"))
      val e3 = oriented.select($"a".as("u"), $"b".as("w"))
      e1.join(e2, Seq("v")).join(e3, Seq("u", "w")).count()
    } finally {
      oriented.unpersist()
    }
  }

  /** Per-vertex triangle counts (each vertex credited once per incident
    * triangle) — the local-count extension, same plan plus an explode over
    * the three corners and a groupBy.
    */
  def perVertex(graph: LinkGraph): DataFrame = {
    val spark = graph.edges.sparkSession
    import spark.implicits._
    val oriented = orientedEdges(graph)
    val e1 = oriented.select($"a".as("u"), $"b".as("v"))
    val e2 = oriented.select($"a".as("v"), $"b".as("w"))
    val e3 = oriented.select($"a".as("u"), $"b".as("w"))
    val tris = e1.join(e2, Seq("v")).join(e3, Seq("u", "w"))
    val corners = tris.select(explode(array($"u", $"v", $"w")).as("id"))
    graph.vertices
      .join(corners.groupBy($"id").agg(count(lit(1)).as("triangles")),
        Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
  }
}
