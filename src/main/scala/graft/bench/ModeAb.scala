package graft.bench

import graft.graph.LinkGraph
import graft.sources.EventEdges

/** Within-session interleaved A/B of broadcast-mode vs shuffle-mode
  * supersteps per algorithm at the query-bench scale (round-6): broadcast
  * mode pays one driver broadcast build + one full materialization per
  * round (the measured ~2^k nested-broadcast pathology forces it), while
  * shuffle mode chains rounds lazily into fused jobs. Which floor is lower
  * is an empirical question per scale — this measures it.
  *
  *   runMain graft.bench.ModeAb <sfDir> <runs> <algo,...>
  * algos: pr, lp, wcc, sssp
  */
object ModeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val algos = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Scaling.session(cpus)

    def freshGraph() = LinkGraph(EventEdges.edges(spark, sfDir))
    def run(algo: String, bv: Long): Double = {
      val g = freshGraph() // fresh caches per run, like the bench
      val t0 = System.nanoTime()
      algo match {
        case "pr" => graft.algos.PageRank.run(g,
          graft.PageRankConfig(5, 0.0, 0.85), broadcastVertices = bv)
          .scores.count()
        case "lp" => graft.algos.LabelPropagation.run(g,
          graft.LabelPropagationConfig(4, earlyStop = false),
          broadcastVertices = bv).labels.count()
        case "wcc" => graft.algos.Wcc.run(g, broadcastVertices = bv)
          .components.count()
        case "sssp" => graft.algos.Sssp.run(g, graft.SsspConfig(0L),
          broadcastVertices = bv).distances.count()
      }
      val s = (System.nanoTime() - t0) / 1e9
      g.unpersistCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s
    }

    algos.foreach { a =>
      run(a, 5000000L); run(a, 0L) // warmup both shapes (JIT)
      val acc = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      for (r <- 1 to runs; mode <- Seq("bcast", "shuffle")) {
        val s = run(a, if (mode == "bcast") 5000000L else 0L)
        acc(mode) = s :: acc(mode)
        println(f"MODEAB algo=$a run=$r mode=$mode wall=$s%.2f")
      }
      Seq("bcast", "shuffle").foreach { m =>
        val ms = acc(m)
        println(f"MODEAB-SUMMARY algo=$a mode=$m min=${ms.min}%.2f " +
          f"mean=${ms.sum / ms.size}%.2f")
      }
    }
    spark.stop()
  }
}
