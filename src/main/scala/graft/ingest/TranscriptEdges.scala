package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript → reply-edge derivation (FIXTURES.md §2, BASELINE.json
  * input_hint).
  *
  * Input schema: (conv_id: string, turn_idx: int, role: string, text: string,
  * tool: string, ts: timestamp). Within each conv_id, ordered by turn_idx,
  * each turn k >= 1 emits a directed edge actor(turn k) -> actor(turn k-1)
  * where actor = coalesce(tool, role). Actor strings map to dense Long ids by
  * dense_rank over sorted actor keys (deterministic). Default weight 1.0;
  * `w=<float>` in text overrides.
  *
  * Scale notes: the lag window partitions by conv_id, so derivation
  * parallelizes across conversations with no global ordering step — at
  * 10^12 turns this is one shuffle on conv_id. The actor dictionary is tiny
  * (distinct actors) and is broadcast into the id-mapping joins.
  */
object TranscriptEdges {

  val ACTOR = "actor"

  /** Dense actor dictionary: actor string -> 0-based Long id, ordered by
    * actor key ascending. Deterministic across partitionings; computed as a
    * DISTRIBUTED dense rank (graft.graph.DistributedRank) — a global
    * `dense_rank() OVER (ORDER BY ...)` would pull every distinct actor
    * through one task, which at 10^12-turn scale (millions of actors) is
    * the same single-partition window the relabel map had to shed.
    */
  def actorDictionary(transcripts: DataFrame): DataFrame = {
    val distinctActors = transcripts
      .select(coalesce(col("tool"), col("role")).as(ACTOR))
      .distinct()
    val parts = transcripts.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    graft.graph.DistributedRank.withDenseRank(distinctActors,
      Seq(col(ACTOR).asc), parts, "actor_id")
      .select(col(ACTOR), col("actor_id"))
  }

  /** Per-turn actor + previous-turn actor via lag over (conv_id, turn_idx). */
  private def replyPairs(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    transcripts
      .select(
        col("conv_id"),
        col("turn_idx"),
        coalesce(col("tool"), col("role")).as("cur"),
        col("text"))
      .withColumn("prev", lag(col("cur"), 1).over(w))
      .filter(col("prev").isNotNull)
  }

  /** Derive Dataset[Edge]-shaped DataFrame (src, dst, weight). */
  def edges(transcripts: DataFrame): DataFrame = {
    val dict = actorDictionary(transcripts)
    val pairs = replyPairs(transcripts)
      .withColumn(
        "weight",
        coalesce(
          nullif(regexp_extract(col("text"), "w=([0-9.eE+-]+)", 1), lit(""))
            .cast("double"),
          lit(1.0)))
    pairs
      .join(broadcast(dict.withColumnRenamed(ACTOR, "cur")
        .withColumnRenamed("actor_id", "src")), Seq("cur"))
      .join(broadcast(dict.withColumnRenamed(ACTOR, "prev")
        .withColumnRenamed("actor_id", "dst")), Seq("prev"))
      .select(col("src"), col("dst"), col("weight"))
  }

  /** North-rule invariant check input: transcripts keyed for round-trip
    * text-equality testing under stable (conv_id, turn_idx) ordering.
    */
  def orderedTexts(transcripts: DataFrame): DataFrame =
    transcripts.select("conv_id", "turn_idx", "text")
      .orderBy("conv_id", "turn_idx")

  /** Node count per reference semantics: max node id + 1
    * (crates/builder/src/input/edgelist.rs:84-90).
    */
  def nodeCount(edges: DataFrame): Long = {
    val row = edges.agg(max(greatest(col("src"), col("dst")))).first()
    if (row.isNullAt(0)) 0L else row.getLong(0) + 1L
  }
}
