package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.util.Try

/** Iteration-state checkpointing with per-partition lineage + convergence
  * metrics (north rule; reference analogue is the binary CSR
  * serialize/deserialize round-trip, crates/app/src/serialize.rs:45-69 and
  * csr.rs:247-314).
  *
  * Every k supersteps the algorithm driver writes the full vertex state as
  * parquet plus a `_meta.json` sidecar carrying (algorithm, iteration, error,
  * partition count, per-partition row counts, total rows). A checkpoint is
  * only considered complete once `_meta.json` exists — parquet is written
  * first, so a crash mid-write leaves the previous checkpoint authoritative.
  * `latest` finds the newest complete checkpoint so a restarted run resumes
  * mid-iteration-sequence instead of from scratch. Writing + re-reading also
  * truncates the growing Catalyst plan/lineage of the iterative loop
  * (SURVEY.md §7.4-5).
  */
object Checkpointer {

  case class Meta(
      algorithm: String,
      iteration: Int,
      error: Double,
      numPartitions: Int,
      partitionRows: Seq[Long],
      totalRows: Long,
      fingerprint: String = "",
      converged: Boolean = false)

  private def metaToJson(m: Meta): String = {
    val rows = m.partitionRows.mkString("[", ",", "]")
    s"""{"algorithm":"${m.algorithm}","iteration":${m.iteration},""" +
      s""""error":${m.error},"numPartitions":${m.numPartitions},""" +
      s""""partitionRows":$rows,"totalRows":${m.totalRows},""" +
      s""""fingerprint":"${m.fingerprint}",""" +
      s""""converged":${m.converged}}"""
  }

  private def metaFromJson(s: String): Meta = {
    def field(name: String): String = {
      val i = s.indexOf("\"" + name + "\":") + name.length + 3
      val rest = s.substring(i)
      rest.takeWhile(c => c != ',' && c != '}' && c != ']')
    }
    val rowsStr = {
      val i = s.indexOf("\"partitionRows\":[") + "\"partitionRows\":[".length
      s.substring(i, s.indexOf("]", i))
    }
    Meta(
      algorithm = field("algorithm").stripPrefix("\"").stripSuffix("\""),
      iteration = field("iteration").trim.toInt,
      error = field("error").trim.toDouble,
      numPartitions = field("numPartitions").trim.toInt,
      partitionRows =
        if (rowsStr.trim.isEmpty) Seq.empty
        else rowsStr.split(",").map(_.trim.toLong).toSeq,
      totalRows = field("totalRows").trim.toLong,
      fingerprint =
        if (s.contains("\"fingerprint\":"))
          field("fingerprint").stripPrefix("\"").stripSuffix("\"")
        else "",
      converged =
        if (s.contains("\"converged\":"))
          field("converged").trim.toBoolean
        else false)
  }

  private def dir(root: String, iteration: Int): Path =
    Paths.get(root, f"ckpt-$iteration%06d")

  /** Write state + meta; returns the re-read (lineage-truncated) DataFrame.
    * `fingerprint` identifies (config, input) — see [[latest]].
    */
  def write(
      root: String,
      algorithm: String,
      iteration: Int,
      error: Double,
      state: DataFrame,
      fingerprint: String = "",
      converged: Boolean = false): DataFrame = {
    val spark = state.sparkSession
    val d = dir(root, iteration)
    val dataPath = d.resolve("state").toString
    state.write.mode("overwrite").parquet(dataPath)
    val reread = spark.read.parquet(dataPath)
    val perPart = reread
      .groupBy(spark_partition_id().as("pid")).count()
      .orderBy(col("pid")).collect().map(_.getLong(1)).toSeq
    val meta = Meta(algorithm, iteration, error,
      numPartitions = perPart.size, partitionRows = perPart,
      totalRows = perPart.sum, fingerprint = fingerprint,
      converged = converged)
    Files.createDirectories(d)
    Files.writeString(d.resolve("_meta.json"), metaToJson(meta))
    reread
  }

  /** Newest complete checkpoint under `root`, if any. When
    * `expectedFingerprint` is non-empty, checkpoints whose recorded
    * fingerprint differs are IGNORED — a stale dir from a different graph /
    * damping / tolerance must not silently resume bogus state (round-1
    * advice: with warmup/timed re-runs it also under-measured later runs by
    * resuming from the previous run's checkpoints).
    */
  def latest(spark: SparkSession, root: String,
      expectedFingerprint: String = "")
      : Option[(Meta, DataFrame)] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return None
    val listing = Files.list(rootPath) // close the directory handle
    val candidates =
      try listing.toArray.toSeq.map(_.asInstanceOf[Path])
      finally listing.close()
    val ordered = candidates
      .filter(p => p.getFileName.toString.startsWith("ckpt-")
        && Files.exists(p.resolve("_meta.json")))
      .sortBy(_.getFileName.toString)
      .reverse
    ordered.view.flatMap { p =>
      Try {
        val meta = metaFromJson(Files.readString(p.resolve("_meta.json")))
        (meta, spark.read.parquet(p.resolve("state").toString))
      }.toOption
    }.find { case (meta, _) =>
      expectedFingerprint.isEmpty || meta.fingerprint == expectedFingerprint
    }
  }
}
