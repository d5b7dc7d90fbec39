package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, one narrow pass, exact. Scale path: LSH
  * bucketing by random-hyperplane sign bits — hyperplane components are a
  * deterministic hash function of (plane, dim), so the whole pipeline stays
  * pure Catalyst expressions with no driver-side randomness, is reproducible
  * across partitionings, and buckets co-locate candidates for a bucket-local
  * top-k (the IVF-style sub-quadratic search).
  */
object Similarity {

  /** Cast to double + precompute L2 norm once (reference P7-style hoisting:
    * one sqrt per vector instead of per pair). Registers the codegen'd
    * graft_dot expression on the session.
    */
  def withNorm(embeddings: DataFrame): DataFrame = {
    graft.functions.ArrayDotProduct.register(embeddings.sparkSession)
    val embD = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb_d"))
    embD.withColumn("norm",
      sqrt(graft.functions.ArrayDotProduct.dot(col("emb_d"), col("emb_d"))))
  }

  /** cosine(a,b) with precomputed norms; the fused-loop dot keeps the
    * sequential left-to-right double accumulation (matches the oracle's
    * list_dot_product on DOUBLE[]).
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    graft.functions.ArrayDotProduct.dot(a, b) / (normA * normB)

  /** Exact brute-force top-k neighbors for each query vector (vec_id in
    * `queryIds`): broadcast the query set, score the corpus, window top-k.
    * Output (query_id, neighbor_id, rank, cosine).
    */
  def bruteForceTopK(
      embeddings: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val queries = e.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("emb_d").as("q_emb"),
        col("norm").as("q_norm"))
    val scored = e.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb_d"),
          col("q_norm"), col("norm")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * a pure function of (plane, dim) via xxhash64 — no RNG state, no
    * broadcast of plane matrices, reproducible everywhere.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000003L)).cast("double")
      / 1000001.5) - 1.0

  /** LSH bucket id from `numPlanes` hyperplane sign bits. */
  def lshBucket(embD: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(embD, sequence(lit(0), size(embD) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus all buckets at Hamming distance 1 (multi-probe — the standard
    * recall lever that avoids re-hashing the corpus). Sub-quadratic: the
    * pair join is bucket-local; bucket count scales as 2^numPlanes, chosen
    * ~sqrt(corpus) like an IVF nlist. Output (query_id, neighbor_id, rank,
    * cosine).
    */
  def lshTopK(
      embeddings: DataFrame, queryMaxId: Long, k: Int,
      numPlanes: Int = 4): DataFrame = {
    val e = withNorm(embeddings)
      .withColumn("bucket", lshBucket(col("emb_d"), numPlanes))
    val probes = (0 until numPlanes).foldLeft(array(col("bucket"))) {
      (acc, p) => array_append(acc, col("bucket").bitwiseXOR(lit(1L << p)))
    }
    val queries = e.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("emb_d").as("q_emb"),
        col("norm").as("q_norm"), explode(probes).as("bucket"))
    val scored = e.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb_d"),
          col("q_norm"), col("norm")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
