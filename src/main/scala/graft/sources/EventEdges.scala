package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edge derivation over the driver-provided `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The engine's primary ingest is transcript tables
  * (graft.ingest.TranscriptEdges); `events` is the sandbox's generic
  * interaction stream and gets the analogous treatment: within each hour
  * bucket, events ordered by (ts, event_id) emit a directed "reply" edge
  * current_user -> previous_user. Bucketing by hour is what makes the
  * window partitioned (parallel, one shuffle) instead of a global sort —
  * the same scale pattern as partitioning transcripts by conv_id.
  *
  * Deterministic, SQL-expressible (the DuckDB oracle states the identical
  * lag window), multigraph with hub users — the skew profile the gather
  * path must absorb.
  */
object EventEdges {

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Two-level windowing (round-1 verdict #7: a single hour-partitioned
    * window makes parallelism = #distinct hours, and one bursty hour
    * serializes into one task): the lag runs within (hour, minute) buckets,
    * and each minute's FIRST event gets its predecessor from a tiny
    * per-minute boundary table (last user of the previous non-empty minute
    * in the same hour, stitched via a broadcast join). Semantically
    * identical to the single hour-window lag — minute buckets are
    * contiguous slices of the hour ordering — which is exactly the form the
    * DuckDB oracle states (edgesSql below); EventEdgesSpec asserts the
    * equivalence row-for-row.
    */
  def edges(events: DataFrame): DataFrame = {
    val base = events
      .select(col("ts"), col("event_id"), col("user_id"), col("value"))
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withColumn("minute", date_trunc("minute", col("ts")))
    val w = Window
      .partitionBy(col("hour"), col("minute"))
      .orderBy(col("ts"), col("event_id"))
    val bounds = base.groupBy(col("hour"), col("minute"))
      .agg(max_by(col("user_id"), struct(col("ts"), col("event_id")))
        .as("last_user"))
    val wb = Window.partitionBy(col("hour")).orderBy(col("minute"))
    val prevBounds = bounds
      .withColumn("prev_last", lag(col("last_user"), 1).over(wb))
      .select(col("hour"), col("minute"), col("prev_last"))
    base
      .withColumn("prev_user", lag(col("user_id"), 1).over(w))
      .join(broadcast(prevBounds), Seq("hour", "minute"), "left")
      .withColumn("prev_user",
        coalesce(col("prev_user"), col("prev_last")))
      .filter(col("prev_user").isNotNull)
      .select(
        col("user_id").as("src"),
        col("prev_user").as("dst"),
        // strictly positive weight for SSSP; value is >= 0 in the data
        (col("value") + lit(1.0)).as("weight"))
  }

  def edges(spark: SparkSession, sfDir: String): DataFrame =
    edges(events(spark, sfDir))

  /** The same derivation in ANSI SQL for the DuckDB oracle. */
  val edgesSql: String =
    """SELECT user_id AS src, prev_user AS dst, value + 1.0 AS weight
      |FROM (
      |  SELECT user_id, value,
      |         lag(user_id) OVER (PARTITION BY date_trunc('hour', ts)
      |                            ORDER BY ts, event_id) AS prev_user
      |  FROM events
      |)
      |WHERE prev_user IS NOT NULL""".stripMargin
}
