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

  def edges(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("ts"), col("event_id"), col("user_id"),
        col("value"))
      .withColumn("prev_user", lag(col("user_id"), 1).over(w))
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
