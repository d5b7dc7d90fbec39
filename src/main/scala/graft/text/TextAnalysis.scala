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

  /** Fixed-size token chunking with stride — the context-window
    * preparation step of a training pipeline: document tokens are cut into
    * windows of `size` tokens starting every `stride` tokens (overlap =
    * size - stride), the final short tail kept. Emits one row per chunk:
    * (doc_id, chunk_idx 0.., n_chunk_tokens, chunk_hash) — the hash (md5
    * of the space-joined window) stands in for the chunk payload so
    * results stay compact; callers slice the original text the same way
    * for the payload. Entirely row-local: `explode` over a
    * `sequence(0, n_starts-1)` of window starts, each window a
    * `slice` of the one tokens array — no shuffle, output volume =
    * corpus * (size/stride) overlap factor.
    *
    * Start positions: ceil(max(n - size, 0) / stride) + 1 windows, so
    * every token is covered and exactly one window starts at or past
    * n - size. A document shorter than `size` yields its single short
    * window.
    */
  def chunk(docs: DataFrame, size: Int = 32, stride: Int = 24): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"invalid chunking: size=$size stride=$stride")
    val toks = tokens(col("text"))
    val n = size_(toks)
    val nStarts = (ceil(greatest(n - size, lit(0)).cast("double") /
      stride.toDouble) + 1).cast("long")
    docs.select(col("doc_id"), toks.as("w"),
      explode(sequence(lit(0L), nStarts - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("w"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(size)).as("cw"))
      .select(col("doc_id"), col("chunk_idx"),
        size_(col("cw")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("cw"))).as("chunk_hash"))
  }

  // org.apache.spark.sql.functions.size, kept addressable where a local
  // `size` parameter shadows it
  private def size_(c: Column): Column = size(c)

  /** Corpus vocabulary statistics — the tokenizer-building primitive:
    * global top-k tokens by occurrence count with document frequency,
    * under the (count desc, token asc) total order so the cut is
    * deterministic. One shuffle keyed by token with map-side partial
    * aggregation (the hub-token skew absorber — 'the' is pre-summed per
    * partition before it moves); the top-k cut is Spark's distributed
    * TakeOrdered (per-partition heads, driver merge of k-sized heaps),
    * never a single-task global sort. Returns
    * (token, n_occurrences, n_docs, rank 1..k).
    */
  def vocabulary(docs: DataFrame, k: Int = 100): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val perDoc = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("token"))
    val counts = perDoc.groupBy(col("token")).agg(
      count(lit(1)).as("n_occurrences"),
      countDistinct(col("doc_id")).as("n_docs"))
    val top = counts
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
    // rank over the k-sized result only — the window runs on <= k rows
    top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occurrences").desc, col("token").asc))
        .cast("long"))
  }

  /** Corpus-level summary — the one-row dataset report card a pipeline
    * publishes after each build: document/token volume, language spread,
    * exact-duplicate rate (1 - distinct fingerprints / docs), and mean
    * quality. One pass, fully partial-aggregatable (every measure is a
    * sum/count over row-local expressions; the two distinct counts are
    * Spark's two-stage partial distinct) — the output is a single row
    * regardless of corpus size.
    */
  def corpusSummary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n"),
      langId(col("text")).as("lang"),
      fingerprint(col("text")).as("fp"),
      qualityScore(col("text")).as("q"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        round(lit(1.0) - countDistinct(col("fp")).cast("double") /
          count(lit(1)).cast("double"), 6).as("dup_rate"),
        round(avg(col("q")), 6).as("mean_quality"))

  /** PII patterns shared verbatim with the DuckDB oracle — restricted to
    * the regex subset with identical semantics in Java regex and RE2
    * (character classes, bounded repeats, ASCII \d and \b; no lookaround,
    * no backrefs).
    */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PHONE_RE = "\\d{3}[- ]?\\d{3,4}[- ]?\\d{4}"

  /** PII scrubbing — the privacy pass of a training pipeline: count and
    * redact email / IPv4 / phone-shaped spans. Redaction order is fixed
    * (email, then IP, then phone) and phones are counted AFTER email/IP
    * redaction so digits inside an address never double-count as a phone.
    * Returns (doc_id, n_emails, n_ips, n_phones, redacted_fingerprint) —
    * the fingerprint is md5 of the fully-redacted text, so two documents
    * differing only in their PII values collapse to the same fingerprint
    * (redaction-aware dedup comes free). Entirely map-only codegen'd
    * regexp work — no shuffle, no UDF.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val t = col("text")
    val noEmailIp =
      regexp_replace(regexp_replace(t, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EMAIL_RE)).cast("long").as("n_emails"),
      regexp_count(t, lit(IP_RE)).cast("long").as("n_ips"),
      regexp_count(noEmailIp, lit(PHONE_RE)).cast("long").as("n_phones"),
      md5(regexp_replace(noEmailIp, PHONE_RE, "<PHONE>"))
        .as("redacted_fingerprint"))
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
