package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup: the continuous counterpart of
  * graft.dedup.Dedup.exact. Batch dedup groups by fingerprint in one
  * shuffle; a stream has to remember which fingerprints it has seen across
  * micro-batches, which is custom keyed state —
  * KeyValueGroupedDataset.flatMapGroupsWithState over the fingerprint key
  * (the engine's one genuinely stateful streaming operator, vs the
  * watermarked join/window aggregations in StreamingIngest).
  *
  * Semantics match the batch operator where their domains overlap:
  * canonical_id = the smallest doc_id seen so far for the fingerprint
  * (within a micro-batch, the batch minimum — deterministic; across
  * batches, first-batch-wins then min-within-batch, the streaming reading
  * of "min doc_id per group" under arrival order). dup_rank counts how
  * many docs of the fingerprint preceded this one (0 = first copy kept).
  *
  * State is one (Long, Long) per DISTINCT fingerprint — the minimal
  * information any exact-dedup stream must hold; at 100 TB this keys the
  * state store by a high-cardinality hash with no skew, and state size is
  * bounded by distinct-document count, not stream length.
  */
object StreamingDedup {

  case class DocIn(doc_id: Long, fingerprint: String)
  case class FpState(canonicalId: Long, seen: Long)
  // fingerprint rides along (last, so positional readers of the first four
  // columns are unaffected): it is what makes the staged output
  // RECONCILABLE — recanonicalize below can regroup rows without access to
  // the original text.
  case class DocOut(doc_id: Long, canonical_id: Long,
      is_duplicate: Boolean, dup_rank: Long, fingerprint: String)

  /** Normalize + fingerprint columns (same normalization as Dedup.exact). */
  def withFingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(lower(regexp_replace(col("text"), "\\s+", " ")))
        .as("fingerprint"))

  def dedupStream(docs: DataFrame): Dataset[DocOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withFingerprint(docs).as[DocIn]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[DocIn], state: GroupState[FpState]) =>
          // sort the micro-batch's group for deterministic ranks (iterator
          // order is partition-dependent); group sizes are per-fingerprint
          // duplicates — tiny
          val batch = rows.toSeq.sortBy(_.doc_id)
          var st = state.getOption.getOrElse(
            FpState(batch.head.doc_id, 0L))
          val out = batch.map { d =>
            val rank = st.seen
            st = FpState(math.min(st.canonicalId, d.doc_id), st.seen + 1)
            DocOut(d.doc_id, st.canonicalId, rank > 0, rank, fp)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Batch-mode replay of the stream's staged output under a deterministic
    * arrival order: doc_id % numBatches assigns each document to a
    * micro-batch, and the first-batch-wins contract of dedupStream is then
    * exactly a pair of running window functions in arrival order
    * (batch, doc_id) — the stream sorts each micro-batch group by doc_id, so
    * a row's emitted canonical is the RUNNING min over arrival order and its
    * dup_rank the running count. A StreamingSpec case pins this equivalence
    * against the real flatMapGroupsWithState stream fed the same batches.
    *
    * This exists so the stream -> recanonicalize reconciliation path can be
    * driver-gated with a DuckDB oracle (streams are not replayable in a
    * one-shot verify harness; this replay is). One shuffle on the
    * high-cardinality fingerprint; window partitions are duplicate-group
    * sized — tiny at any scale.
    */
  def stagedArrivalOrder(docs: DataFrame, numBatches: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fingerprint"))
      .orderBy(col("batch"), col("doc_id"))
    withFingerprint(docs)
      .withColumn("batch", pmod(col("doc_id"), lit(numBatches.toLong)))
      .select(col("doc_id"),
        min(col("doc_id")).over(w).as("canonical_id"),
        (row_number().over(w) > 1).as("is_duplicate"),
        (row_number().over(w) - 1).cast("long").as("dup_rank"),
        col("fingerprint"))
  }

  /** Periodic batch re-canonicalization over the staged stream output: the
    * stream's canonical ids are first-batch-wins (an already-emitted row is
    * never retracted), so a later micro-batch carrying a SMALLER doc_id
    * leaves earlier rows pointing at a non-minimal canonical — a documented
    * divergence from batch Dedup.exact's global-min contract. This job
    * closes it: one shuffle on the (high-cardinality, skew-free)
    * fingerprint rewrites every row to the global min per fingerprint, so
    * stream + reconciliation == batch regardless of arrival order.
    * dup_rank is preserved as the arrival-order fact it is.
    */
  def recanonicalize(staged: DataFrame): DataFrame = {
    // window-min instead of aggregate+self-join: ONE shuffle on the
    // high-cardinality fingerprint (partitions are group-sized — tiny), and
    // no self-referencing plan (a staged view self-joined against its own
    // aggregate trips Catalyst's conflicting-reference resolution).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fingerprint"))
    staged
      .withColumn("true_canonical", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("true_canonical").as("canonical_id"),
        (col("doc_id") =!= col("true_canonical")).as("is_duplicate"),
        col("dup_rank"), col("fingerprint"))
  }
}
