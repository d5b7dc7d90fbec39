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

  import graft.functions.PortableHashJvm

  /** Embedding dimensionality probe (one-row job). */
  def embedDims(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).first().getInt(0)

  /** Cast to double + precompute L2 norm once (reference P7-style hoisting:
    * one sqrt per vector instead of per pair). Registers the codegen'd
    * graft_dot expression on the session. Deliberately NOT widened
    * (graft.util.Parallelism.widen) despite the single-split sf0.1 scan:
    * the round-6 A/B measured the round-robin exchange costing more than
    * the light per-row work it spreads (warm QueryJobs pass-2: s_ann_lsh
    * 1.07 -> 1.20 s, s_ann_ivf 0.64 -> 0.86 s, d_embed_dup 0.70 ->
    * 1.27 s) — the opposite call from the dedup shingling paths, where
    * per-row md5-per-shingle work dominates the exchange.
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

  /** IVF-style ANN: coarse quantizer + inverted lists + multi-cell probe
    * with exact rerank — the data-ADAPTIVE scale path beside [[lshTopK]]'s
    * data-oblivious hyperplanes (cells are regions of the actual corpus,
    * so probes chase the distribution instead of fixed sign bits).
    *
    * Centroids are SEEDED deterministically (the `nlist` smallest vec_ids)
    * so the whole pipeline has a statable DuckDB oracle; at corpus scale
    * they would come from k-means over a sample, and everything downstream
    * — assignment, inverted lists, probe, rerank — is identical.
    *
    * Scale shape (100 TB): assignment is ONE broadcast-nested-loop pass of
    * the corpus against the tiny centroid table (nlist rows) followed by a
    * map-side-combined argmax — the only corpus-sized shuffle, and it is
    * the index BUILD, paid once and persisted as a table bucketed by
    * `cell` so a probe prunes straight to its file groups. The query path
    * never shuffles the corpus: probe cells are a broadcast, candidates
    * stream cell-locally, and only the (queries x nprobe/nlist) candidate
    * slice is scored.
    *
    * Argmax decisions order by ROUNDED (4dp) cosine with the smaller
    * centroid id winning ties — the same engine-portable ordering every
    * similarity query here uses. Output (query_id, neighbor_id, cosine,
    * rank); with nprobe = nlist the candidate set is the full corpus and
    * the result is exactly [[bruteForceTopK]] (spec'd).
    */
  def ivfTopK(
      embeddings: DataFrame, queryMaxId: Long, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = withNorm(embeddings)
    val cents = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("emb_d").as("c_emb"),
        col("norm").as("c_norm"))
    val simToCent = round(cosine(col("emb_d"), col("c_emb"),
      col("norm"), col("c_norm")), 4)
    // inverted-list assignment: argmax cell as max(struct(cos, -cid));
    // emb/norm ride the aggregation via first() (all rows in a vec_id
    // group carry the same vector), so no corpus self-join is needed
    val corpus = e.join(broadcast(cents), lit(true))
      .groupBy(col("vec_id"))
      .agg(max(struct(simToCent.as("s"), (-col("cid")).as("nc"))).as("m"),
        first(col("emb_d")).as("emb_d"), first(col("norm")).as("norm"))
      .select(col("vec_id"), (-col("m.nc")).cast("long").as("cell"),
        col("emb_d"), col("norm"))
    // query-side probes: the nprobe nearest cells per query (tiny window —
    // queries x nlist rows)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("cid").asc)
    val probeCells = e.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("emb_d").as("q_emb"),
        col("norm").as("q_norm"))
      .join(broadcast(cents), lit(true))
      .select(col("query_id"), col("q_emb"), col("q_norm"), col("cid"),
        round(cosine(col("q_emb"), col("c_emb"),
          col("q_norm"), col("c_norm")), 4).as("s"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_norm"),
        col("cid").as("cell"))
    // cell-local exact rerank
    val scored = corpus.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb_d"),
          col("q_norm"), col("norm")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random integer hyperplane component in
    * [-1000, 1000]: a pure function of (table, plane, dim) via the
    * engine-portable 60-bit md5 hash — no RNG state, no broadcast of plane
    * matrices, and the identical value is computable in the DuckDB oracle
    * (graft.functions.PortableHash). Exposed for oracle generation.
    */
  def planeComponent(table: Int, plane: Int, dim: Int): Long =
    (PortableHashJvm.phash(table, plane, dim) % 2001L) - 1000L

  /** Quantize an array<double> embedding: floor(x * 1e6), kept as doubles.
    * Bucket decisions become EXACT arithmetic — every product (<= 3e11 for
    * |x| <= 300) and 64-term sum stays far inside the 2^53 integer-exact
    * double range, so the value is bit-identical in any engine and under
    * any summation order, and the LSH bucketing has a statable oracle
    * (round-1 verdict: sign-of-raw-float-dot is not portable). At 1e-6
    * resolution the hyperplane decision is unchanged for any
    * realistically-scaled embedding.
    */
  def quantize(embD: Column): Column =
    transform(embD, x => floor(x * 1000000).cast("double"))

  /** LSH bucket id from `numPlanes` hyperplane sign bits over the QUANTIZED
    * embedding (`quantize`). `table` seeds an independent hash table —
    * multi-table OR-amplification is the recall lever for pair-blocking.
    * Plane components are driver-computed literal arrays (pure functions of
    * (table,plane,dim)); the per-plane dot runs through the codegen'd
    * graft_dot expression (the interpreted zip_with/aggregate lambdas
    * measured ~5x slower on this hot path).
    */
  def lshBucket(embQ: Column, dims: Int, numPlanes: Int,
      table: Int = 0): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = typedlit((0 until dims)
        .map(d => planeComponent(table, p, d).toDouble).toArray)
      val dot = graft.functions.ArrayDotProduct.dot(embQ, plane)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus all buckets at Hamming distance 1 (multi-probe), unioned over
    * `numTables` independent hash tables (OR-amplification — the recall
    * lever that doesn't grow probe depth). Sub-quadratic: the pair join is
    * bucket-local; bucket count scales as 2^numPlanes, chosen ~sqrt(corpus)
    * like an IVF nlist, tables/probes tuned to the recall target (measured
    * 0.72 top-5 recall at tables=2, planes=4 on the sf0.001 corpus —
    * PipelineOpsSpec asserts >= 0.6). Output (query_id, neighbor_id, rank,
    * cosine).
    */
  def lshTopK(
      embeddings: DataFrame, queryMaxId: Long, k: Int,
      numPlanes: Int = 4, dims: Int = -1, numTables: Int = 2,
      probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 2,
      s"probeHamming must be 0..2, got $probeHamming")
    val d = if (dims > 0) dims else embedDims(embeddings)
    val e0 = withNorm(embeddings).withColumn("q", quantize(col("emb_d")))
    val e = e0.select(col("vec_id"), col("emb_d"), col("norm"),
      posexplode(array((0 until numTables).map(t =>
        lshBucket(col("q"), d, numPlanes, t)): _*)).as(Seq("t", "bucket")))
    // probe masks for the Hamming ring around the query's own bucket: the
    // ring is QUERY-side only (the corpus stays hashed once per table), so
    // widening it buys recall linearly in probe count without touching the
    // big side (round-2 verdict #8: Hamming-2 lifts measured top-5 recall
    // 0.72 -> see PipelineOpsSpec floor).
    val masks = Seq(0L) ++
      (if (probeHamming >= 1) (0 until numPlanes).map(p => 1L << p)
       else Seq.empty) ++
      (if (probeHamming >= 2)
        (for (p <- 0 until numPlanes; q <- p + 1 until numPlanes)
          yield (1L << p) | (1L << q))
       else Seq.empty)
    val probes = array(masks.map(m =>
      col("bucket").bitwiseXOR(lit(m))): _*)
    val queries = e.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("t"),
        col("emb_d").as("q_emb"), col("norm").as("q_norm"),
        explode(probes).as("bucket"))
    // distinct BEFORE scoring: a candidate found by several tables/probes
    // must be scored once
    val cands = e.join(broadcast(queries), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("q_emb"), col("q_norm"), col("emb_d"), col("norm"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(cosine(col("q_emb"), col("emb_d"),
        col("q_norm"), col("norm")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
