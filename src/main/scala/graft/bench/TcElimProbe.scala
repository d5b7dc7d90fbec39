package graft.bench

import graft.algos.TriangleCount
import graft.graph.LinkGraph
import graft.sources.EventEdges

/** One-question probe: does Bench's frozen `.count()` action over
  * `perVertex` eliminate the triangle subtree (left join with an
  * aggregate right side keyed on the join column, no right column
  * referenced by count)? Prints the optimized COUNT plan's operator set
  * and times count vs noop on the sf events graph, so the claim in
  * OPTIMIZATION_r06.md is measured, not inferred.
  *
  * Usage: runMain graft.bench.TcElimProbe [sfDir]
  */
object TcElimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Scaling.session(cpus)

    def pass(): (Double, Double) = {
      val pv = TriangleCount.perVertex(LinkGraph(EventEdges.edges(spark, sfDir)))
      val t0 = System.nanoTime()
      pv.count()
      val tCount = (System.nanoTime() - t0) / 1e9
      val opt = pv.groupBy().count().queryExecution.optimizedPlan.toString
      val hasJoin = opt.contains("Join")
      val hasGenerate = opt.contains("Generate")
      println(s"[probe] count-plan contains Join=$hasJoin Generate=$hasGenerate")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val pv2 = TriangleCount.perVertex(LinkGraph(EventEdges.edges(spark, sfDir)))
      val t1 = System.nanoTime()
      pv2.write.format("noop").mode("overwrite").save()
      val tNoop = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (tCount, tNoop)
    }
    pass() // warm
    val (c, n) = pass()
    println(f"[probe] perVertex count=$c%.2f s  noop(all columns)=$n%.2f s")
    spark.stop()
  }
}
