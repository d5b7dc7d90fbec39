package graft.bench

import graft.algos.TriangleCount
import graft.graph.LinkGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Triangle count at bench scale (round-5 verdict task #4): run the
  * degree-oriented wedge join on a materialized Zipf bench graph and
  * report, besides wall time, the quantity the O(sqrt m) scale claim
  * rests on — the MAXIMUM ORIENTED OUT-DEGREE. On a hub-heavy graph the
  * naive src<dst orientation leaves the hub with out-degree ~= its raw
  * degree (wedge join squares it); the low-(degree,id) -> high
  * orientation provably caps it near sqrt(2m), and this driver prints
  * both the cap and the measured max so the no-wedge-explosion claim is
  * checkable per run, not just argued.
  *
  * Usage: runMain graft.bench.TcBench <benchEdgesPath> [global|local]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object TcBench {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val mode = if (args.length > 1) args(1) else "global"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // the shared measurement session (Scaling.measureConf: explicit-hints-
    // only joins, AQE off, tmpfs shuffle) so the timed plan is the same
    // plan the query suite runs, not an auto-broadcast variant
    val spark = Scaling.session(cpus)
    import spark.implicits._

    val edges = spark.read.parquet(path) // raw (src, dst, weight)
    val graph = LinkGraph(edges)

    // orientation audit: max oriented out-degree vs the sqrt(2m) cap
    val oriented = TriangleCount.orientedEdges(graph)
    val m = oriented.count()
    val maxOut = oriented.groupBy($"a").agg(count(lit(1)).as("d"))
      .agg(max($"d")).first().getLong(0)
    println(f"[tc] simple undirected edges m=$m%d  " +
      f"max oriented out-degree=$maxOut%d  sqrt(2m)=${math.sqrt(2.0 * m)}%.0f")

    val t0 = System.nanoTime()
    if (mode == "local") {
      // noop sink, NOT count() (guide §1.4): count over perVertex's
      // left join (right side unique per id, no right column referenced)
      // lets the optimizer eliminate the whole triangle subtree — the
      // 112M run "finished" in 18 s that way, computing nothing
      TriangleCount.perVertex(graph)
        .write.format("noop").mode("overwrite").save()
      println(f"[tc] perVertex (noop sink, all columns) in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else {
      val tris = TriangleCount.run(graph)
      println(f"[tc] global triangles=$tris%d in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
