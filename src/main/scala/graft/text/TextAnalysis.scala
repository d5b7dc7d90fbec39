package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table. All pure Catalyst expressions (codegen'd, no UDFs):
  * per-row narrow transforms that scan-parallelize trivially and push column
  * pruning into the parquet scan — at 100TB each of these is a single
  * map-only stage.
  *
  * Every function is deterministic and stated identically in the DuckDB
  * oracle SQL (SparkEntry.oracleSql).
  */
object TextAnalysis {

  /** whitespace tokens of trimmed text */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** token count (whitespace segmentation) */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count proxy: tokens split further on 4-char chunks —
    * ceil(len/4) summed ~ len(text without spaces)/4 rounded up per token.
    */
  def subwordCount(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  private val EN = Seq("the", "a", "of", "and", "is")
  private val ES = Seq("el", "la", "los", "de", "y")
  private val DE = Seq("der", "die", "das", "und", "ist")
  private val FR = Seq("le", "la", "les", "et", "est")

  private def markerCount(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(markers.map(lit(_)): _*)))
      .cast("long")

  /** stopword (EN marker) ratio over tokens */
  def stopwordRatio(c: Column): Column =
    round(markerCount(c, EN).cast("double") /
      greatest(tokenCount(c), lit(1L)).cast("double"), 6)

  /** Language id via marker-token counting (n-gram heuristic, SURVEY-style
    * deterministic tie-break): argmax of per-language marker counts with
    * fixed priority en>es>de>fr on ties; 'und' when no marker hits.
    * Encoded as cnt*10+priority so plain bigint greatest() is the argmax —
    * identical arithmetic in Spark and DuckDB.
    */
  def langId(c: Column): Column = {
    val en = markerCount(c, EN) * 10 + 4
    val es = markerCount(c, ES) * 10 + 3
    val de = markerCount(c, DE) * 10 + 2
    val fr = markerCount(c, FR) * 10 + 1
    val best = greatest(en, es, de, fr)
    when(best < 10, lit("und"))
      .when(best % 10 === 4, lit("en"))
      .when(best % 10 === 3, lit("es"))
      .when(best % 10 === 2, lit("de"))
      .otherwise(lit("fr"))
  }

  /** alpha / punctuation / whitespace character ratios */
  def alphaRatio(c: Column): Column =
    round(length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double"), 6)

  def punctRatio(c: Column): Column =
    round(length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double"), 6)

  /** Composite quality score in [0,1]:
    * 0.4*min(tokens/64,1) + 0.3*alpha_ratio + 0.2*(1-punct_ratio)
    * + 0.1*min(stopword_ratio*5,1) — favors long, clean, natural text.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 64.0, lit(1.0))
    val alpha = length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")
    val punct = length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")
    val stop = markerCount(c, EN).cast("double") /
      greatest(tokenCount(c), lit(1L)).cast("double")
    round(lit(0.4) * lenScore + lit(0.3) * alpha +
      lit(0.2) * (lit(1.0) - punct) +
      lit(0.1) * least(stop * 5.0, lit(1.0)), 6)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Stable across engines (hex string), the exact-dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(c, "\\s+", " ")))

  /** Word k-gram shingles (distinct per doc handled by caller). */
  def shingles(c: Column, k: Int = 3): Column = {
    val toks = tokens(c)
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Full per-document stats frame. */
  def stats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      subwordCount(col("text")).as("n_subwords"),
      length(col("text")).cast("long").as("n_chars_computed"),
      alphaRatio(col("text")).as("alpha_ratio"),
      punctRatio(col("text")).as("punct_ratio"),
      stopwordRatio(col("text")).as("stopword_ratio"),
      langId(col("text")).as("lang_detected"),
      qualityScore(col("text")).as("quality"),
      fingerprint(col("text")).as("fingerprint"))

  /** Max token multiplicity of a document, computed ROW-LOCALLY: sort the
    * token array, then fold it tracking (previous token, current equal-run
    * length, best run). O(n log n) per row inside whole-stage codegen —
    * every repetition stat is a pure function of one text value, so no
    * explode/groupBy shuffle of the corpus-sized token stream is ever
    * needed (the naive `explode → groupBy (doc, token)` shape shuffles
    * ~the whole corpus at 100 TB; this shuffles nothing).
    */
  def topTokenMultiplicity(c: Column): Column = {
    val folded = aggregate(
      array_sort(tokens(c)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run =
          when(x === acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    folded
  }

  /** Per-document repetition metrics — the boilerplate/spam signal of a
    * quality pipeline: distinct-token ratio (1.0 = no repetition) and the
    * share of the document taken by its single most-repeated token.
    * Entirely map-only (see [[topTokenMultiplicity]]); returns
    * (doc_id, n_tokens, distinct_ratio, top_token_ratio).
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = greatest(size(toks), lit(1)).cast("double")
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      round(size(array_distinct(toks)).cast("double") / n, 6)
        .as("distinct_ratio"),
      round(topTokenMultiplicity(col("text")).cast("double") / n, 6)
        .as("top_token_ratio"))
  }
}
