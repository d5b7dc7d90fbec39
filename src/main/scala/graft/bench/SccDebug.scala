package graft.bench

import graft.SccConfig
import graft.algos.Scc
import graft.graph.LinkGraph
import org.apache.spark.sql.SparkSession

/** Ad-hoc SCC driver for plan/round inspection (GRAFT_SCC_DEBUG=1). */
object SccDebug {
  def main(args: Array[String]): Unit = {
    val n =
      if (args.nonEmpty && !args(0).startsWith("/")) args(0).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scc-debug")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges =
      if (args.nonEmpty && args(0).startsWith("/") &&
          args(0).contains("bench"))
        spark.read.parquet(args(0)) // raw (src, dst, weight) edge table
      else if (args.nonEmpty && args(0).startsWith("/"))
        graft.sources.EventEdges.edges(spark, args(0))
      else (0 until n)
        .map(v => (v.toLong, ((v + 1) % n).toLong, 1.0))
        .toDF("src", "dst", "weight")
    val t0 = System.nanoTime()
    val res = Scc.run(LinkGraph(edges), SccConfig())
    val out = res.components.collect().map(r =>
      r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    println(s"[scc] done in ${(System.nanoTime() - t0) / 1e9}s " +
      s"converged=${res.stats.converged} iters=${res.stats.iterations}")
    println(s"[scc] labels: ${out.take(10).mkString(",")} ...")
    println(s"[scc] distinct sccs: ${out.map(_._2).distinct.length}")
    spark.stop()
  }
}
