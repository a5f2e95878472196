package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Ops.{asciiLower, asciiLowerSql, ffloor}

/** The composed training-data pipeline — the end-to-end flow the llmops
  * operators exist for: normalize → exact-dedup → quality-filter →
  * corpus stats. Each stage is a narrow/one-shuffle DataFrame transform,
  * so the composition is one linear scan + two keyed shuffles at any
  * scale. Near-dup removal (MinHash q30) plugs in between dedup and
  * filter when the corpus needs it.
  */
object CorpusPipeline {

  /** Whitespace-normalized, lowercased text. The whitespace class is
    * explicit — `\s` means different sets in Java regex (includes \x0B)
    * vs RE2 (doesn't), and md5 downstream amplifies a one-char divergence
    * into a fingerprint/sample-membership flip between engines.
    */
  val WhitespaceClass = "[ \\t\\n\\r\\f]+"
  def normalize(docs: DataFrame): DataFrame =
    docs.withColumn("text_norm",
      regexp_replace(asciiLower(col("text")), WhitespaceClass, " "))

  /** Exact dedup on normalized-content fingerprint, lowest doc_id wins. */
  def dedupExact(normalized: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text_norm"))).orderBy(col("doc_id"))
    normalized
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Quality gate: token-count band + stopword ratio below threshold. */
  def qualityFilter(docs: DataFrame, minTokens: Int, maxTokens: Int,
                    maxStopRatio: Double): DataFrame = {
    val ts = split(col("text_norm"), " ")
    val nTok = size(ts)
    val stopRatio = ffloor(
      size(filter(ts, t => t.isin("the", "a"))).cast("double") / nTok, 4)
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("stop_ratio", stopRatio)
      .filter(nTok.between(minTokens, maxTokens) && stopRatio < maxStopRatio)
  }

  /** Per-language corpus statistics of the surviving documents. */
  def corpusStats(filtered: DataFrame): DataFrame =
    filtered
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        ffloor(sum(col("n_tokens")).cast("double") / count(lit(1)), 2).as("avg_tokens"))
      .orderBy("lang")

  /** q46: the full pipeline as one oracled query. */
  val q46 = QuerySpec(
    "q46_corpus_pipeline",
    (s, d) =>
      corpusStats(qualityFilter(dedupExact(normalize(Tables.documents(s, d))),
        minTokens = 20, maxTokens = 300, maxStopRatio = 0.15)),
    Some(s"""WITH norm AS (
              SELECT doc_id, lang,
                regexp_replace(${asciiLowerSql("text")}, '[ \t\n\r\f]+', ' ', 'g') AS text_norm
              FROM documents),
            deduped AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text_norm)
                  ORDER BY doc_id) AS rn
                FROM norm) WHERE rn = 1),
            scored AS (
              SELECT lang,
                len(string_split(text_norm, ' ')) AS n_tokens,
                CAST(FLOOR(CAST(len(list_filter(string_split(text_norm, ' '),
                    t -> t IN ('the', 'a'))) AS DOUBLE)
                  / len(string_split(text_norm, ' ')) * 10000.0) AS DOUBLE) / 10000.0
                  AS stop_ratio
              FROM deduped),
            filtered AS (
              SELECT * FROM scored
              WHERE n_tokens BETWEEN 20 AND 300 AND stop_ratio < 0.15)
            SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              CAST(FLOOR(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) * 100.0) AS DOUBLE) / 100.0
                AS avg_tokens
            FROM filtered GROUP BY lang ORDER BY lang""")
  )

  // ---------------------------------------------------------------- q47
  /** Content-addressed sampling: select ~1/8 of the corpus by md5-prefix
    * of the normalized text. Unlike `sample()` (engine-RNG-specific),
    * hash sampling is stable across engines, runs, partitionings, and
    * re-ingestions of the same document — the property that makes
    * held-out splits reproducible at 100 TB. Oracled exactly.
    */
  val q47 = QuerySpec(
    "q47_hash_sample",
    (s, d) =>
      normalize(Tables.documents(s, d))
        .filter(substring(md5(col("text_norm")), 1, 1).isin("0", "1"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum(length(col("text"))).cast("long").as("sampled_chars"))
        .orderBy("lang"),
    Some(s"""SELECT lang, COUNT(*) AS n_sampled,
              CAST(SUM(length(text)) AS BIGINT) AS sampled_chars
            FROM documents
            WHERE substr(md5(regexp_replace(${asciiLowerSql("text")}, '[ \t\n\r\f]+', ' ', 'g')), 1, 1)
                  IN ('0', '1')
            GROUP BY lang ORDER BY lang""")
  )

  // ------------------------------------------------------------ chunking
  /** Split documents into fixed-size token chunks with overlap — the
    * standard pre-training/embedding chunking pass. Pure per-row expression
    * work (sequence → slice → explode): narrow until the explode, no
    * shuffle, output rows ≈ tokens/stride per doc at any corpus size.
    */
  def chunk(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap < chunkSize, "overlap must be < chunkSize")
    val stride = chunkSize - overlap
    val ts = split(asciiLower(col("text")), " ")
    val n = size(ts)
    val lastIdx = floor((n - 1).cast("double") / stride).cast("int")
    docs
      .withColumn("__chunk_idx", explode(sequence(lit(0), lastIdx)))
      .select(
        col("doc_id"),
        col("__chunk_idx").as("chunk_idx"),
        concat_ws(" ", slice(ts, col("__chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
      .withColumn("chunk_tokens", size(split(col("chunk_text"), " ")))
  }

  /** q48: chunking over documents (50-token chunks, 10 overlap), chunk
    * text content-hashed for compact exact comparison.
    */
  val q48 = QuerySpec(
    "q48_doc_chunking",
    (s, d) =>
      chunk(Tables.documents(s, d), chunkSize = 50, overlap = 10)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            idx AS (
              SELECT doc_id, ts,
                unnest(range(0, (len(ts) - 1) // 40 + 1)) AS chunk_idx
              FROM toks)
            SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
              CAST(len(list_slice(ts, chunk_idx * 40 + 1,
                LEAST(chunk_idx * 40 + 50, len(ts)))) AS INTEGER) AS chunk_tokens,
              md5(array_to_string(list_slice(ts, chunk_idx * 40 + 1,
                LEAST(chunk_idx * 40 + 50, len(ts))), ' ')) AS chunk_md5
            FROM idx ORDER BY doc_id, chunk_idx""")
  )

  // ------------------------------------------------------ decontamination
  /** q58: benchmark decontamination — find corpus documents that share
    * any 8-gram with a held-out evaluation set (here: doc_id < 10 plays
    * the eval set; in production it's the benchmark suite). The standard
    * train/test-overlap pass every serious pretraining pipeline runs.
    *
    * Scale shape: the eval side is SMALL by definition → its distinct
    * 8-gram set broadcasts; the corpus side streams through one
    * broadcast-hash semi-ish join keyed on the gram — no shuffle of the
    * corpus at all, no candidate blowup (the join output is bounded by
    * corpus-grams-that-hit, aggregated per doc). Exactly oracle-able.
    */
  val q58 = QuerySpec(
    "q58_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val evalGrams = Dedup.shingles(docs.filter(col("doc_id") < 10), 8)
        .select("shingle").distinct()
      Dedup.shingles(docs.filter(col("doc_id") >= 10), 8)
        .join(broadcast(evalGrams), "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared_8grams"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 8),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 6),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                      || '_' || ts[i+4] || '_' || ts[i+5] || '_' || ts[i+6] || '_' || ts[i+7])) AS g
                FROM toks)),
            eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10)
            SELECT doc_id, COUNT(*) AS n_shared_8grams
            FROM grams JOIN eval_grams USING (g)
            WHERE doc_id >= 10
            GROUP BY doc_id ORDER BY doc_id""")
  )

  // --------------------------------------------------- stratified sample
  /** q59: per-language stratified sample — 20% of each language stratum,
    * membership decided by content-addressed hash rank within the
    * stratum (not engine RNG): reproducible across engines, runs, and
    * re-partitionings, and every stratum is represented proportionally —
    * the balanced-multilingual-sampling pass. One window shuffle on the
    * stratum key.
    */
  val q59 = QuerySpec(
    "q59_stratified_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byLang = Window.partitionBy("lang")
      val w = byLang.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(byLang))
        .filter(col("rn") <= ceil(col("n") * 0.2))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    },
    Some("""SELECT lang, doc_id FROM (
              SELECT lang, doc_id,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY lang) AS n
              FROM documents)
            WHERE rn <= CEIL(n * 0.2)
            ORDER BY lang, doc_id""")
  )

  // ------------------------------------------------------- data mixture
  /** q60: domain-mixture sampling — resample the corpus with a target
    * rate per `source` domain (oversampled domains keep everything,
    * down-weighted domains keep a hash-ranked fraction): the pretraining
    * data-mixing pass ("2 epochs of wiki, 0.2 of crawl"). Membership is
    * content-addressed hash rank within the domain — deterministic across
    * engines/layouts, like q47/q59 — and the whole selection is one
    * window shuffle on the domain key. Output: per-domain totals.
    */
  val q60 = QuerySpec(
    "q60_data_mixture",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rate = when(col("source").isin("src0", "src1", "src2", "src3"), 1.0)
        .when(col("source").isin("src4", "src5", "src6", "src7"), 0.5)
        .otherwise(0.2)
      val bySource = Window.partitionBy("source")
      val w = bySource.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(bySource))
        .filter(col("rn") <= ceil(col("n") * rate))
        .groupBy("source")
        .agg(max(col("n")).as("n_total"), count(lit(1)).as("n_sampled"))
        .orderBy("source")
    },
    Some("""SELECT source, MAX(n) AS n_total, COUNT(*) AS n_sampled FROM (
              SELECT source, doc_id,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY source) AS n,
                CASE WHEN source IN ('src0','src1','src2','src3') THEN 1.0
                     WHEN source IN ('src4','src5','src6','src7') THEN 0.5
                     ELSE 0.2 END AS rate
              FROM documents)
            WHERE rn <= CEIL(n * rate)
            GROUP BY source ORDER BY source""")
  )

  val all: Seq[QuerySpec] = Seq(q46, q47, q48, q58, q59, q60)
}
