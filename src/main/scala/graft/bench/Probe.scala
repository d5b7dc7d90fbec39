package graft.bench

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch micro-probe for scaling diagnostics (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(path, cores) = args
    val spark = Scaling.session(cores.toInt)
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val raw = spark.read.parquet(path)
    time("scan+agg (parquet)") {
      raw.groupBy(col("dst")).agg(sum(col("weight"))).count(): Unit
    }
    val cached = raw.repartition(cores.toInt, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    time("agg (cached)") {
      cached.groupBy(col("dst")).agg(sum(col("weight"))).count(): Unit
    }
    val deser = raw.repartition(cores.toInt, col("src"))
      .persist(StorageLevel.MEMORY_ONLY_SER)
    deser.count()
    time("join+agg (cached, broadcast state)") {
      val senders = cached.groupBy(col("src").as("id"))
        .agg(count(lit(1)).cast("double").as("s"))
      cached.join(broadcast(senders), col("src") === col("id"))
        .groupBy(col("dst")).agg(sum(col("s"))).count(): Unit
    }
    time("pure scan (cached)") { cached.agg(sum(col("src"))).count(): Unit }
    spark.stop()
  }
}

object Probe2 {
  def main(args: Array[String]): Unit = {
    val Array(cores) = args
    val spark = Scaling.session(cores.toInt)
    import org.apache.spark.sql.functions._
    def time(label: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("range sum (pure codegen)") {
      spark.range(0, 4000000000L, 1, cores.toInt)
        .agg(sum(col("id") % 7)).count(): Unit
    }
    time("range groupBy 200k keys") {
      spark.range(0, 400000000L, 1, cores.toInt)
        .groupBy((col("id") % 200000).as("k"))
        .agg(count(lit(1))).count(): Unit
    }
    spark.stop()
  }
}

/** Per-stage diagnostics for one measured PageRank run: stage wall time,
  * summed task time, max task (straggler), shuffle bytes — the evidence
  * base for scaling-efficiency analysis. Usage:
  *   runMain graft.bench.StageStats <edgesPath> <NxC|cores> <steps> <bcast>
  */
object StageStats {
  def main(args: Array[String]): Unit = {
    val Array(path, cores, steps, bcast) = args
    val (master, total) = Pair.master(cores)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-spark-local"))
    val spark = Scaling.sessionFor(master,
      sys.env.get("GRAFT_PARTS").map(_.toInt)
        .getOrElse(math.max(total, 8)), Scaling.measureConf)
    import org.apache.spark.scheduler._
    val stats = new scala.collection.concurrent.TrieMap[
      Int, (String, Long, Long, Long, Long, Long, Int)]()
    val maxTask = new scala.collection.concurrent.TrieMap[Int, Long]()
    // per-task (partition index, run ms) per stage: distinguishes a FIXED
    // straggler partition (skew — same index every superstep) from a roving
    // one (GC / host noise)
    val taskDetail = new scala.collection.concurrent.TrieMap[
      Int, List[(Int, Long)]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      private val t0 = new scala.collection.concurrent.TrieMap[Int, Long]()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        t0(s.stageInfo.stageId) = System.nanoTime()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          val rt = t.taskMetrics.executorRunTime
          maxTask.updateWith(t.stageId) {
            case Some(m) => Some(math.max(m, rt)); case None => Some(rt)
          }: Unit
          taskDetail.updateWith(t.stageId) {
            case Some(l) => Some((t.taskInfo.index, rt) :: l)
            case None => Some(List((t.taskInfo.index, rt)))
          }: Unit
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (System.nanoTime() -
          t0.getOrElse(i.stageId, System.nanoTime())) / 1000000L
        val m = i.taskMetrics
        stats(i.stageId) = (i.name.takeWhile(_ != '\n').take(60), wall,
          m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.executorCpuTime / 1000000L,
          i.numTasks)
      }
    })
    try {
      val g = graft.graph.LinkGraph(spark.read.parquet(path),
        numPartitions = sys.env.get("GRAFT_PARTS").map(_.toInt)
          .getOrElse(math.max(total, 8)))
      val cfg = graft.PageRankConfig(steps.toInt, 0.0, 0.85)
      val bv = if (bcast.toBoolean) 5000000L else 0L
      graft.algos.PageRank.run(g, cfg, broadcastVertices = bv)
        .scores.count() // warmup (builds caches)
      stats.clear()
      val t0 = System.nanoTime()
      graft.algos.PageRank.run(g, cfg, broadcastVertices = bv)
        .scores.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGESTATS total=$sec%.2f s cores=$total")
      val rows = stats.toSeq.sortBy(_._1)
      println(f"${"id"}%5s ${"wall_ms"}%8s ${"task_ms"}%9s ${"cpu_ms"}%9s " +
        f"${"max_t"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"tasks"}%5s  name")
      rows.foreach { case (id, (name, wall, task, shr, shw, cpu, nt)) =>
        println(f"$id%5d $wall%8d $task%9d $cpu%9d " +
          f"${maxTask.getOrElse(id, 0L)}%7d ${shr / 1048576}%7d " +
          f"${shw / 1048576}%7d $nt%5d  $name")
        if (nt > 8) {
          val top = taskDetail.getOrElse(id, Nil).sortBy(-_._2).take(5)
            .map { case (idx, ms) => s"p$idx:${ms}ms" }.mkString(" ")
          println(s"      top tasks: $top")
        }
      }
      val agg = rows.map(_._2).foldLeft((0L, 0L, 0L)) {
        case ((w, t, c), (_, wall, task, _, _, cpu, _)) =>
          (w + wall, t + task, c + cpu)
      }
      println(f"SUM wall=${agg._1}ms task=${agg._2}ms cpu=${agg._3}ms " +
        f"parallelism=${agg._2.toDouble / agg._1}%.1f " +
        f"cpuFrac=${agg._3.toDouble / agg._2}%.2f")
    } finally spark.stop()
  }
}

/** Within-session interleaved A/B of gather-salt configs: session-to-session
  * host noise on this VM swings wall AND summed task CPU by ~15%, so
  * cross-session single runs cannot rank configs a few percent apart.
  * One JVM, caches built per config up front (warmup), then configs
  * alternate A,B,A,B... so both sample the same host windows.
  *   runMain graft.bench.SaltAb <edgesPath> <NxC|cores> <steps> <runs> \
  *     <spec>... where spec = salt[:div] (salt 1 = unsalted)
  */
object SaltAb {
  def main(args: Array[String]): Unit = {
    val path = args(0); val cores = args(1)
    val steps = args(2).toInt; val runs = args(3).toInt
    val specs = args.drop(4).toSeq
    // the gate protocol's own spec parsing — a drifting copy here would
    // A/B under a different cluster shape than the rolls it explains
    val (master, total) = Pair.master(cores)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-spark-local"))
    val parts = sys.env.get("GRAFT_PARTS").map(_.toInt)
      .getOrElse(math.max(total, 8))
    val spark = Scaling.sessionFor(master, parts, Scaling.measureConf)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime): Unit
    })
    try {
      val g = graft.graph.LinkGraph(spark.read.parquet(path),
        numPartitions = parts)
      val cfg = graft.PageRankConfig(steps, 0.0, 0.85)
      def parse(s: String): (Int, Long) = s.split(":") match {
        case Array(a) => (a.toInt, 2L)
        case Array(a, d) => (a.toInt, d.toLong)
      }
      // GRAFT_SALTAB_ALGO=lp swaps the measured job to label propagation
      // (fixed-iteration mode, same superstep count) — the round-4 verdict
      // #6 engage-or-decline measurement for LP's own gather
      val algo = sys.env.getOrElse("GRAFT_SALTAB_ALGO", "pr")
      def once(spec: String): (Double, Double) = {
        val (salt, div) = parse(spec)
        sys.props("graft.salt.div") = div.toString
        val c0 = cpuNs.get(); val t0 = System.nanoTime()
        if (algo == "lp")
          graft.algos.LabelPropagation.run(g,
            graft.LabelPropagationConfig(maxIterations = steps,
              earlyStop = false),
            broadcastVertices = 0L, gatherSalt = salt).labels.count()
        else
          graft.algos.PageRank.run(g, cfg, broadcastVertices = 0L,
            gatherSalt = salt).scores.count()
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get() - c0) / 1e9)
      }
      specs.foreach { s => once(s); () } // warmup: build each cache
      val acc = scala.collection.mutable.Map[String,
        List[(Double, Double)]]().withDefaultValue(Nil)
      for (r <- 1 to runs; s <- specs) {
        val m = once(s)
        acc(s) = m :: acc(s)
        println(f"SALTAB run=$r spec=$s wall=${m._1}%.2f cpu=${m._2}%.1f")
      }
      specs.foreach { s =>
        val ms = acc(s)
        println(f"SALTAB-SUMMARY spec=$s " +
          f"minWall=${ms.map(_._1).min}%.2f " +
          f"meanWall=${ms.map(_._1).sum / ms.size}%.2f " +
          f"minCpu=${ms.map(_._2).min}%.1f " +
          f"meanCpu=${ms.map(_._2).sum / ms.size}%.1f")
      }
    } finally spark.stop()
  }
}

/** Within-session interleaved A/B of SSSP round-batch sizes (the g_sssp
  * action-floor knob): one JVM, one shared LinkGraph cache, configs
  * alternate A,B,C,A,B,C so every batch size samples the same host windows
  * (cross-session runs swing ~15% on this VM — see SaltAb).
  *   runMain graft.bench.SsspBatchAb <sfDir|edgesPath> <cores> <runs> \
  *     <batch>...
  */
object SsspBatchAb {
  def main(args: Array[String]): Unit = {
    val path = args(0); val cores = args(1).toInt
    val runs = args(2).toInt
    val spark = Scaling.session(cores)
    try {
      val edges =
        if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$path/events.parquet")))
          graft.sources.EventEdges.edges(spark, path)
        else spark.read.parquet(path)
      val g = graft.graph.LinkGraph(edges)
      // spec = batch[:bcastLazy] — bcastLazy rides the system property so
      // one session can A/B broadcast-mode materialization cadence too
      def parse(s: String): (Int, Int) = s.split(":") match {
        case Array(a) => (a.toInt, 1)
        case Array(a, l) => (a.toInt, l.toInt)
      }
      def once(spec: String): Double = {
        val (batch, lzy) = parse(spec)
        sys.props("graft.sssp.bcastlazy") = lzy.toString
        val t0 = System.nanoTime()
        graft.algos.Sssp.run(g,
          graft.SsspConfig(0L, roundBatch = batch)).distances.count()
        (System.nanoTime() - t0) / 1e9
      }
      val specs = args.drop(3).toSeq
      specs.foreach { b => once(b); () } // warmup: caches + JIT per shape
      val acc = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      for (r <- 1 to runs; b <- specs) {
        val s = once(b)
        acc(b) = s :: acc(b)
        println(f"SSSPAB run=$r spec=$b wall=$s%.2f")
      }
      specs.foreach { b =>
        val ms = acc(b)
        println(f"SSSPAB-SUMMARY spec=$b min=${ms.min}%.2f " +
          f"mean=${ms.sum / ms.size}%.2f")
      }
    } finally spark.stop()
  }
}

object GenBench {
  def main(args: Array[String]): Unit = {
    val Array(path, convs, turns, actors) = args
    val n = Scaling.materializeBenchEdges(path, convs.toInt, turns.toInt,
      actors.toInt)
    println(s"GEN edges=$n path=$path")
  }
}
