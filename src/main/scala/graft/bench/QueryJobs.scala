package graft.bench

import org.apache.spark.scheduler._

/** Per-query job/stage breakdown for the driver queries — the round-6
  * optimization round's measurement harness (guide §1: measure first; §7.1:
  * map wall time to jobs/stages before touching code). NOT part of the
  * frozen bench contract: Bench.scala times `fn(spark, sfDir).count()`
  * exactly as before; this tool reproduces that action under a listener so
  * each materialization (checkpoint, broadcast build, count) shows its own
  * wall share.
  *
  * Usage: runMain graft.bench.QueryJobs <query>[,query...] [sfDir] [passes]
  * Env: SPARK_GRAFT_CPUS (default 32) — same session shape as Bench.
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Scaling.session(cpus)

    case class Job(id: Int, desc: String, ms: Long, stages: Int,
        tasks: Int, shuffleReadMb: Long, shuffleWriteMb: Long)
    val jobs = new scala.collection.concurrent.TrieMap[Int, Job]()
    val jobT0 = new scala.collection.concurrent.TrieMap[Int, Long]()
    val stageToJob = new scala.collection.concurrent.TrieMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobT0(j.jobId) = System.nanoTime()
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(j.jobId) = Job(j.jobId, desc.take(70), 0, 0, 0, 0, 0)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val ms = (System.nanoTime() -
          jobT0.getOrElse(j.jobId, System.nanoTime())) / 1000000L
        jobs.updateWith(j.jobId)(_.map(x => x.copy(ms = ms))): Unit
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stageToJob.get(i.stageId).foreach { jid =>
          jobs.updateWith(jid)(_.map(x => x.copy(
            stages = x.stages + 1,
            tasks = x.tasks + i.numTasks,
            shuffleReadMb = x.shuffleReadMb +
              i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576,
            shuffleWriteMb = x.shuffleWriteMb +
              i.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576))): Unit
        }
      }
    })

    names.foreach { name =>
      (1 to passes).foreach { pass =>
        jobs.clear(); jobT0.clear(); stageToJob.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // same inter-pass cache release as Bench: cold caches, warm JVM
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        println(f"QUERYJOBS $name pass=$pass total=$sec%.2f s " +
          f"jobs=${jobs.size}")
        if (pass == passes) {
          jobs.values.toSeq.sortBy(_.id).foreach { j =>
            println(f"  job=${j.id}%4d ${j.ms}%6d ms stages=${j.stages}%2d " +
              f"tasks=${j.tasks}%4d shR=${j.shuffleReadMb}%4d MB " +
              f"shW=${j.shuffleWriteMb}%4d MB  ${j.desc}")
          }
          val tracked = jobs.values.map(_.ms).sum / 1000.0
          println(f"  tracked job wall=$tracked%.2f s (gaps = driver/plan time)")
        }
      }
    }
    spark.stop()
  }
}
