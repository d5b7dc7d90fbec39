package graft

import graft.algos._
import graft.graph.LinkGraph
import graft.sources.EventEdges
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Graph queries run over the reply-edge graph derived from the `events`
  * table (graft.sources.EventEdges — same derivation stated in ANSI SQL for
  * the DuckDB oracle). Iterative algorithms are pinned to a fixed superstep
  * count in the query (tolerance=0) so the oracle can state the identical
  * unrolled recurrence; convergence-mode behavior is covered by ScalaTest
  * golden/oracle suites.
  */
object SparkEntry {

  private def graph(s: SparkSession, dir: String): LinkGraph =
    LinkGraph(EventEdges.edges(s, dir))

  /** Flagship: PageRank over the sf0.001 events reply graph. */
  def entry(spark: SparkSession): DataFrame =
    PageRank.run(graph(spark, "/root/testdata/sf0.001"),
      PageRankConfig(5, 0.0, 0.85)).scores

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_edges" -> ((s, dir) => EventEdges.edges(s, dir)),

    "g_degrees" -> ((s, dir) => graph(s, dir).degrees),

    "g_to_undirected" -> ((s, dir) =>
      graph(s, dir).undirected),

    "g_relabel_map" -> ((s, dir) => {
      // degree-descending relabel map (SURVEY.md §2.12,
      // graph_ops.rs:511-638): old id -> new id by (deg DESC, id ASC).
      import org.apache.spark.sql.expressions.Window
      graph(s, dir).degrees.select(col("id"),
        (row_number().over(
          Window.orderBy(col("deg").desc, col("id").asc)) - 1)
          .cast("long").as("new_id"))
    }),

    "g_pagerank5" -> ((s, dir) =>
      PageRank.run(graph(s, dir), PageRankConfig(5, 0.0, 0.85))
        .scores.select(col("id"), round(col("score"), 6).as("score"))),

    "g_wcc" -> ((s, dir) => Wcc.run(graph(s, dir)).components),

    "g_lp4" -> ((s, dir) =>
      LabelPropagation.run(graph(s, dir), LabelPropagationConfig(4)).labels),

    "g_triangle_count" -> ((s, dir) => {
      val tc = TriangleCount.run(graph(s, dir))
      s.range(1).select(lit(tc).as("triangles"))
    }),

    "g_sssp" -> ((s, dir) =>
      Sssp.run(graph(s, dir), SsspConfig(0L)).distances
        .filter(col("dist") =!= lit(Double.PositiveInfinity))
        .select(col("id"), round(col("dist"), 6).as("dist"))),

    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            4).as("sum_revenue"),
          count(lit(1)).as("count_order"))),

    // ------------------- training-data pipeline ops (documents/embeddings)
    "t_stats" -> ((s, dir) =>
      graft.text.TextAnalysis.stats(docs(s, dir))),

    "d_exact_dup" -> ((s, dir) =>
      graft.dedup.Dedup.exact(docs(s, dir))),

    "d_ngram_jaccard" -> ((s, dir) =>
      graft.dedup.Dedup.ngramJaccard(docs(s, dir), 0.5)),

    "d_minhash_lsh" -> ((s, dir) => // approximate: rows-only driver check
      graft.dedup.Dedup.minHashLsh(docs(s, dir), 0.5)),

    "d_simhash_pairs" -> ((s, dir) => // approximate: rows-only driver check
      graft.dedup.Dedup.simHashPairs(docs(s, dir), 16)),

    "d_embed_dup" -> ((s, dir) =>
      graft.dedup.Dedup.embeddingDuplicates(embs(s, dir), 0.4)),

    "s_ann_topk" -> ((s, dir) =>
      graft.sim.Similarity.bruteForceTopK(embs(s, dir), 10L, 5)),

    "s_ann_lsh" -> ((s, dir) => // approximate: rows-only driver check
      graft.sim.Similarity.lshTopK(embs(s, dir), 10L, 5)),

    "m_blob_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.asBlobs(docs(s, dir))
        .select(col("doc_id"), col("media_type"), col("n_bytes"))),

    "m_features" -> ((s, dir) => // stubbed decoder: rows-only driver check
      graft.multimodal.Multimodal.extractFeatures(
        graft.multimodal.Multimodal.asBlobs(docs(s, dir))).toDF())
  )

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // ---------------------------------------------------------------- oracle

  private val EDGES_CTE =
    "edges AS (" + EventEdges.edgesSql.replace("\n", " ") + ")"
  private val VERTS_CTE =
    "verts AS (SELECT unnest(generate_series(0, " +
      "(SELECT max(greatest(src,dst)) FROM edges)))::BIGINT AS id)"

  private def prSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""i$k AS MATERIALIZED (SELECT d.id,
         | (SELECT 0.15/n FROM n) + 0.85 * COALESCE(g.in_sum, 0.0) AS score
         | FROM deg d LEFT JOIN (
         |   SELECT e.dst AS id, sum(s.score / dg.out_deg) AS in_sum
         |   FROM edges e JOIN i${k - 1} s ON e.src = s.id
         |   JOIN deg dg ON e.src = dg.id GROUP BY e.dst) g USING (id))"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n")
    s"""WITH $EDGES_CTE,
       |$VERTS_CTE,
       |n AS (SELECT count(*)::DOUBLE AS n FROM verts),
       |deg AS (SELECT v.id, COALESCE(o.c, 0.0) AS out_deg FROM verts v
       | LEFT JOIN (SELECT src AS id, count(*)::DOUBLE AS c FROM edges
       |  GROUP BY 1) o USING (id)),
       |i0 AS (SELECT id, (SELECT 1.0/n FROM n) AS score FROM verts),
       |$steps
       |SELECT id, round(score, 6) AS score FROM i$iters""".stripMargin
  }

  private def lpSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""i$k AS MATERIALIZED (SELECT l.id,
         | COALESCE(m.new_label, l.label) AS label FROM i${k - 1} l
         | LEFT JOIN (SELECT id, label AS new_label FROM (
         |   SELECT u.b AS id, l2.label, count(*) AS cnt,
         |     row_number() OVER (PARTITION BY u.b
         |       ORDER BY count(*) DESC, l2.label ASC) AS rn
         |   FROM undm u JOIN i${k - 1} l2 ON u.a = l2.id
         |   GROUP BY u.b, l2.label) WHERE rn = 1) m ON l.id = m.id)"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n")
    s"""WITH $EDGES_CTE,
       |undm AS (SELECT src AS a, dst AS b FROM edges WHERE src <> dst
       | UNION ALL SELECT dst, src FROM edges WHERE src <> dst),
       |$VERTS_CTE,
       |i0 AS (SELECT id, id AS label FROM verts),
       |$steps
       |SELECT id, label FROM i$iters""".stripMargin
  }

  private def ssspSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
         | SELECT id, dist FROM d${k - 1} UNION ALL
         | SELECT e.dst AS id, p.dist + e.weight AS dist
         | FROM d${k - 1} p JOIN edges e ON e.src = p.id) GROUP BY id)"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n")
    s"""WITH $EDGES_CTE,
       |d0 AS (SELECT 0::BIGINT AS id, 0.0 AS dist),
       |$steps
       |SELECT id, round(dist, 6) AS dist FROM d$iters""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "g_edges" -> EventEdges.edgesSql,

    "g_degrees" ->
      s"""WITH $EDGES_CTE, $VERTS_CTE
         |SELECT v.id, COALESCE(o.c, 0)::BIGINT AS out_deg,
         |  COALESCE(i.c, 0)::BIGINT AS in_deg,
         |  (COALESCE(o.c, 0) + COALESCE(i.c, 0))::BIGINT AS deg
         |FROM verts v
         |LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY 1)
         |  o USING (id)
         |LEFT JOIN (SELECT dst AS id, count(*) AS c FROM edges GROUP BY 1)
         |  i USING (id)""".stripMargin,

    "g_to_undirected" ->
      s"""WITH $EDGES_CTE
         |SELECT src, dst, weight FROM edges
         |UNION ALL SELECT dst AS src, src AS dst, weight FROM edges"""
        .stripMargin,

    "g_relabel_map" ->
      s"""WITH $EDGES_CTE, $VERTS_CTE,
         |deg AS (SELECT v.id,
         |  (COALESCE(o.c, 0) + COALESCE(i.c, 0))::BIGINT AS deg
         | FROM verts v
         | LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY 1)
         |   o USING (id)
         | LEFT JOIN (SELECT dst AS id, count(*) AS c FROM edges GROUP BY 1)
         |   i USING (id))
         |SELECT id, (row_number() OVER (ORDER BY deg DESC, id ASC) - 1)
         |  ::BIGINT AS new_id FROM deg""".stripMargin,

    "g_pagerank5" -> prSql(5),

    "g_wcc" ->
      s"""WITH RECURSIVE $EDGES_CTE,
         |und AS (SELECT DISTINCT src AS a, dst AS b FROM edges
         | WHERE src <> dst
         | UNION SELECT DISTINCT dst, src FROM edges WHERE src <> dst),
         |$VERTS_CTE,
         |reach(id, r) AS (SELECT id, id FROM verts
         | UNION SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.id)
         |SELECT id, min(r) AS comp FROM reach GROUP BY id""".stripMargin,

    "g_lp4" -> lpSql(4),

    "g_triangle_count" ->
      s"""WITH $EDGES_CTE,
         |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |      FROM edges WHERE src <> dst)
         |SELECT count(*)::BIGINT AS triangles
         |FROM e e1 JOIN e e2 ON e1.b = e2.a
         |JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin,

    "g_sssp" -> ssspSql(12),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_revenue,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "t_stats" -> {
      def mk(markers: Seq[String]): String =
        "len(list_filter(w, x -> x IN (" +
          markers.map(m => s"'$m'").mkString(",") + ")))"
      val en = mk(Seq("the", "a", "of", "and", "is"))
      val es = mk(Seq("el", "la", "los", "de", "y"))
      val de = mk(Seq("der", "die", "das", "und", "ist"))
      val fr = mk(Seq("le", "la", "les", "et", "est"))
      s"""WITH t AS (SELECT doc_id, text,
         |  regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
         |SELECT doc_id,
         |  len(w)::BIGINT AS n_tokens,
         |  list_sum(list_transform(w, x -> ceil(length(x)/4.0)::BIGINT))
         |    ::BIGINT AS n_subwords,
         |  length(text)::BIGINT AS n_chars_computed,
         |  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))*1.0
         |    / greatest(length(text), 1), 6) AS alpha_ratio,
         |  round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))*1.0
         |    / greatest(length(text), 1), 6) AS punct_ratio,
         |  round($en*1.0 / greatest(len(w), 1), 6) AS stopword_ratio,
         |  CASE WHEN greatest($en*10+4, $es*10+3, $de*10+2, $fr*10+1) < 10
         |    THEN 'und'
         |    WHEN greatest($en*10+4, $es*10+3, $de*10+2, $fr*10+1)
         |      % 10 = 4 THEN 'en'
         |    WHEN greatest($en*10+4, $es*10+3, $de*10+2, $fr*10+1)
         |      % 10 = 3 THEN 'es'
         |    WHEN greatest($en*10+4, $es*10+3, $de*10+2, $fr*10+1)
         |      % 10 = 2 THEN 'de'
         |    ELSE 'fr' END AS lang_detected,
         |  round(0.4 * least(len(w)/64.0, 1.0)
         |    + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))*1.0
         |        / greatest(length(text), 1))
         |    + 0.2 * (1.0 -
         |        length(regexp_replace(text, '[^.,;:!?]', '', 'g'))*1.0
         |        / greatest(length(text), 1))
         |    + 0.1 * least(($en*1.0 / greatest(len(w), 1)) * 5.0, 1.0), 6)
         |    AS quality,
         |  md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
         |FROM t""".stripMargin
    },

    "d_exact_dup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |g AS (SELECT fp, min(doc_id) AS canonical_id,
        |  count(*)::BIGINT AS group_size FROM fp GROUP BY fp)
        |SELECT f.doc_id, g.canonical_id, g.group_size
        |FROM fp f JOIN g USING (fp)""".stripMargin,

    "d_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
        |  WHERE len(w) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS s
        |  FROM toks WHERE len(w) < 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS i FROM sh a
        |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT doc_a, doc_b,
        |    round(i*1.0 / (sa.n + sb.n - i), 6) AS jaccard
        |  FROM inter JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b)
        |WHERE jaccard >= 0.5""".stripMargin,

    "d_embed_dup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |    AS norm FROM embeddings)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 4)
        |      AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4""".stripMargin,

    "s_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |    AS norm FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
        |  FROM e WHERE vec_id < 10),
        |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |  round(list_dot_product(q.q_emb, e.emb) / (q.q_norm * e.norm), 4)
        |    AS cosine
        |  FROM e JOIN q ON e.vec_id <> q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |  ORDER BY cosine DESC, neighbor_id ASC)::BIGINT AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank FROM r
        |WHERE rank <= 5""".stripMargin,

    "m_blob_meta" ->
      """SELECT doc_id, 'application/fake-image' AS media_type,
        |  octet_length(encode(text))::BIGINT AS n_bytes
        |FROM documents""".stripMargin
  )
}
