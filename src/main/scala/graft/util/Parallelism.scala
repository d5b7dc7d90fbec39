package graft.util

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for CPU-heavy map stages (optimization guide
  * §2.5 "input skew: one huge unsplittable file ... repartition immediately
  * after the read" and §1.2 step 1 — fix the distributed shape before the
  * per-task work).
  *
  * A corpus whose parquet footprint is below
  * `spark.sql.files.maxPartitionBytes` arrives as ONE scan split, so every
  * downstream row-local transform (shingling, per-shingle md5, signature
  * aggregation) serializes into a single task no matter how many cores the
  * session has — measured 2.6 s single-task shingle+hash jobs at sf0.1
  * against ~0.1 s spread over 32 cores. At 100 TB the input has orders of
  * magnitude more splits than cores and [[widen]] is the identity: the
  * branch can only ever ADD an exchange of a provably tiny input, never a
  * shuffle of a large one.
  */
object Parallelism {

  /** Round-robin repartition `df` up to the session's default parallelism
    * when (and only when) its physical plan yields fewer partitions.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
