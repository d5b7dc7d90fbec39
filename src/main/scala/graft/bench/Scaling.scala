package graft.bench

import graft.PageRankConfig
import graft.algos.PageRank
import graft.fixtures.Fixtures
import graft.graph.LinkGraph
import graft.ingest.TranscriptEdges
import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling measurement (BASELINE.md sandbox protocol):
  * the north rule's N -> 4N executor criterion, evidenced in this sandbox by
  * running the identical PageRank job at local[N] and local[4N] on the same
  * pre-materialized edge table and reporting edges/sec/superstep at both
  * plus efficiency = thrpt(4N) / (4 * thrpt(N)).
  */
object Scaling {

  case class Point(cores: Int, edges: Long, supersteps: Int,
      elapsedSec: Double) {
    def edgesPerSecPerSuperstep: Double = edges.toDouble * supersteps /
      elapsedSec
  }

  /** Measurement-session tuning (applied only to scaling runs, not the
    * query bench): shuffle on tmpfs (container /tmp is disk-backed overlay
    * — shuffle I/O serializes there), no surprise auto-broadcasts (explicit
    * hints only, so the measured plan is the designed plan).
    */
  val measureConf: Map[String, String] = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    // AQE's per-stage replanning adds serial driver latency to the fused
    // fixed-iteration pipeline and buys nothing there (no skewed shuffle
    // joins in broadcast mode); production convergence-mode runs keep it.
    "spark.sql.adaptive.enabled" -> "false",
    "spark.local.dir" -> "/dev/shm/graft-spark-local")

  def session(cores: Int,
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
    b.config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    // extra tuning pairs: "k=v,k=v" via env, highest precedence (experiments)
    sys.env.get("GRAFT_SPARK_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("="); b.config(k, v) })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate the deterministic Zipf-skew transcript bench graph
    * (FIXTURES.md §5) and materialize its edge table to parquet so every
    * measurement reads the identical input.
    */
  def materializeBenchEdges(
      path: String, numConvs: Int, turnsPerConv: Int,
      numActors: Int): Long = {
    val spark = session(Runtime.getRuntime.availableProcessors())
    try {
      val ts = Fixtures.zipfTranscripts(spark, numConvs, turnsPerConv,
        numActors)
      val edges = TranscriptEdges.edges(ts)
      edges.write.mode("overwrite").parquet(path)
      spark.read.parquet(path).count()
    } finally spark.stop()
  }

  /** One measured point: PageRank for `supersteps` fixed iterations on the
    * materialized edge table at local[cores]. One identical warmup run
    * (graph build + full iteration sequence) precedes the measured run —
    * the reference CLI's warmup/measure protocol (app.rs:124-153).
    */
  def measure(path: String, cores: Int, supersteps: Int,
      broadcastState: Boolean = true): Point = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-spark-local"))
    val spark = session(cores, measureConf)
    try {
      val edges = spark.read.parquet(path)
      val g = LinkGraph(edges, numPartitions =
        sys.env.get("GRAFT_PARTS").map(_.toInt)
          .getOrElse(math.max(cores, 8)))
      val m = g.edgeCount
      g.bySrc.count() // materialize the partitioned cache
      val cfg = PageRankConfig(supersteps, 0.0, 0.85)
      val bv = if (broadcastState) 5000000L else 0L
      // fixed-iteration runs are lazy — force the full pipeline with count()
      PageRank.run(g, cfg, broadcastVertices = bv).scores.count() // warmup
      val t0 = System.nanoTime()
      PageRank.run(g, cfg, broadcastVertices = bv).scores.count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      Point(cores, m, supersteps, elapsed)
    } finally spark.stop()
  }

  /** Full N vs 4N protocol; returns (point N, point 4N, efficiency). */
  def nVs4n(
      path: String, n: Int = 8, supersteps: Int = 5,
      broadcastState: Boolean = true)
      : (Point, Point, Double) = {
    val pN = measure(path, n, supersteps, broadcastState)
    val p4N = measure(path, n * 4, supersteps, broadcastState)
    val eff = p4N.edgesPerSecPerSuperstep /
      (4.0 * pN.edgesPerSecPerSuperstep)
    (pN, p4N, eff)
  }
}

/** Manual experiment CLI:
  * runMain graft.bench.ScalingCli <edgesPath> <cores> <supersteps> <bcast>
  */
object ScalingCli {
  def main(args: Array[String]): Unit = {
    val Array(path, cores, steps, bcast) = args
    val p = Scaling.measure(path, cores.toInt, steps.toInt,
      broadcastState = bcast.toBoolean)
    println(f"""{"cores":${p.cores},"edges":${p.edges},""" +
      f""""supersteps":${p.supersteps},"sec":${p.elapsedSec}%.2f,""" +
      f""""eps":${p.edgesPerSecPerSuperstep}%.0f,"broadcast":$bcast}""")
  }
}
