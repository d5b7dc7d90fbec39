package graft.runner

import graft._
import graft.algos._
import graft.graph.LinkGraph
import graft.ingest.TranscriptEdges
import graft.sources.{EventEdges, GraphSources}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** spark-submit entry point (SURVEY.md §3.5), mirroring the reference CLI
  * (crates/app/src/app.rs): algorithm subcommand, input dispatch by format,
  * warmup + measured runs with averaged timing (app.rs:124-153), metrics
  * JSON to stdout, result table written to --out.
  *
  * Usage:
  *   GraphRunner <page_rank|wcc|scc|lp|tc|sssp|ingest>
  *     --input <path> [--format edges|events|transcripts|edgelist|graph500]
  *     [--out <dir>] [--runs 1] [--warmup-runs 0]
  *     [--max-iterations N] [--tolerance X] [--start-node N]
  *     [--checkpoint-dir <dir>] [--partitions N]
  */
object Main {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  /** warmup + timed runs, returns (result of last run, avg seconds) —
    * the reference's time() harness (app.rs:124-153). */
  private def time[T](runs: Int, warmups: Int)(f: () => T): (T, Double) = {
    (0 until warmups).foreach(_ => f())
    var total = 0L
    var last: Option[T] = None
    (0 until runs).foreach { _ =>
      val t0 = System.nanoTime()
      last = Some(f())
      total += System.nanoTime() - t0
    }
    (last.get, total / 1e9 / runs)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "missing subcommand")
    val algo = args(0)
    val input = arg(args, "input").getOrElse(
      sys.error("--input required"))
    val format = arg(args, "format").getOrElse("edges")
    val runs = arg(args, "runs").map(_.toInt).getOrElse(1)
    val warmups = arg(args, "warmup-runs").map(_.toInt).getOrElse(0)
    val out = arg(args, "out")
    val ckpt = arg(args, "checkpoint-dir")
    val parts = arg(args, "partitions").map(_.toInt)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val builder = SparkSession.builder()
      .appName(s"graft-$algo")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "1") != "0")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects the master; default to local when launched bare
    if (!sys.props.contains("spark.master"))
      builder.master(s"local[$parts]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // graph500 carries an explicit node count (Kronecker convention
    // node_count = edge_count/16, reference graph500.rs:63-127) that max_id+1
    // would get wrong on inputs with isolated tail vertices — wire it through
    // (round-1 verdict #2).
    val (edges: DataFrame, explicitNodes: Long) = format match {
      case "edges" => (spark.read.parquet(input), -1L)
      case "events" => (EventEdges.edges(spark.read.parquet(input)), -1L)
      case "transcripts" =>
        (TranscriptEdges.edges(spark.read.parquet(input)), -1L)
      case "edgelist" => (GraphSources.edgeList(spark, input), -1L)
      case "graph500" => GraphSources.graph500(spark, input)
      case other => sys.error(s"unknown format $other")
    }
    val g = LinkGraph(edges, numPartitions = parts,
      nodeCount = explicitNodes)

    def writeOut(df: DataFrame): Unit =
      out.foreach(o => df.write.mode("overwrite").parquet(o))

    // Namespace the checkpoint dir per timed run: with warmups/runs > 1 a
    // later run must not resume from the previous run's checkpoints (that
    // under-measures avg_seconds). Crash-resume still works for the normal
    // runs=1 case — the run-0 path is deterministic across launches.
    val runIdx = new java.util.concurrent.atomic.AtomicInteger(0)
    def ckptFor(): Option[String] =
      ckpt.map(c => s"$c/run-${runIdx.getAndIncrement()}")

    val (metrics, avgSec): (String, Double) = algo match {
      case "ingest" =>
        val ((), sec) = time(runs, warmups) { () =>
          writeOut(edges); ()
        }
        (s""""rows":${edges.count()}""", sec)
      case "page_rank" =>
        val cfg = PageRankConfig(
          arg(args, "max-iterations").map(_.toInt).getOrElse(20),
          arg(args, "tolerance").map(_.toDouble).getOrElse(1e-4),
          arg(args, "damping").map(_.toDouble).getOrElse(0.85))
        // -1 = AUTO hub splitting (PageRank.autoSalt); 1 disables
        val gatherSalt = arg(args, "gather-salt").map(_.toInt).getOrElse(-1)
        val (res, sec) = time(runs, warmups)(() =>
          PageRank.run(g, cfg, checkpointDir = ckptFor(),
            gatherSalt = gatherSalt))
        writeOut(res.scores)
        val err = if (res.stats.error.isNaN) "null"
          else res.stats.error.toString
        (s""""iterations":${res.stats.iterations},"error":$err""", sec)
      case "wcc" =>
        val cfg = WccConfig(
          arg(args, "max-iterations").map(_.toInt).getOrElse(200),
          // -1 = AUTO (the default, like the reference's default Afforest,
          // app.rs:15); 0 disables contraction
          contractAfter =
            arg(args, "contract-after").map(_.toInt).getOrElse(-1))
        val (res, sec) = time(runs, warmups)(() =>
          Wcc.run(g, cfg, checkpointDir = ckptFor()))
        writeOut(res.components)
        (s""""iterations":${res.stats.iterations}""", sec)
      case "lp" =>
        val cfg = LabelPropagationConfig(
          arg(args, "max-iterations").map(_.toInt).getOrElse(20))
        val (res, sec) = time(runs, warmups)(() =>
          LabelPropagation.run(g, cfg, checkpointDir = ckptFor()))
        writeOut(res.labels)
        (s""""iterations":${res.stats.iterations}""", sec)
      case "scc" =>
        val (res, sec) = time(runs, warmups)(() =>
          Scc.run(g, SccConfig(), checkpointDir = ckptFor()))
        writeOut(res.components)
        (s""""iterations":${res.stats.iterations}""", sec)
      case "tc" =>
        val (n, sec) = time(runs, warmups)(() => TriangleCount.run(g))
        (s""""triangles":$n""", sec)
      case "sssp" =>
        val cfg = SsspConfig(
          arg(args, "start-node").map(_.toLong).getOrElse(0L),
          delta = arg(args, "delta").map(_.toDouble)
            .getOrElse(Double.PositiveInfinity))
        val (res, sec) = time(runs, warmups)(() =>
          Sssp.run(g, cfg, checkpointDir = ckptFor()))
        writeOut(res.distances)
        (s""""iterations":${res.stats.iterations}""", sec)
      case other => sys.error(s"unknown algorithm $other")
    }

    println(s"""{"algo":"$algo","avg_seconds":$avgSec,"runs":$runs,""" +
      s""""warmup_runs":$warmups,"nodes":${g.nodeCount},""" +
      s""""edges":${g.edgeCount},$metrics}""")
    spark.stop()
  }
}
