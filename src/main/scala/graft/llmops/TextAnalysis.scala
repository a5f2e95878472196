package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Ops.{asciiLower, asciiLowerSql, capKeyFreq, fanOut, ffloor}

/** Text-analysis operators over the `documents` table: tokenization +
  * top-k token counts, quality scoring, language-ID heuristic, and
  * document fingerprinting. All are single-shuffle DataFrame plans
  * (explode → groupBy token, or narrow per-row expressions), so they
  * scale linearly with the corpus.
  */
object TextAnalysis {

  private val StopWords = Seq("the", "a")

  // ---------------------------------------------------------------- q23
  /** Token counting: explode(split) → groupBy token → top-50. The groupBy
    * key is the token (high cardinality at real scale); partial map-side
    * counts keep the shuffle small. Top-k is a global sort of the already
    * tiny aggregate, not of the corpus.
    */
  val q23 = QuerySpec(
    "q23_text_tokens",
    (s, d) =>
      Tables.documents(s, d)
        .repartition(col("doc_id")) // parallelize the explode past one input split
        .select(explode(split(asciiLower(col("text")), " ")).as("token"))
        .filter(!col("token").isin(StopWords: _*) && col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
    Some(s"""SELECT token, COUNT(*) AS n FROM (
              SELECT unnest(string_split(${asciiLowerSql("text")}, ' ')) AS token
              FROM documents)
            WHERE token NOT IN ('the', 'a') AND token <> ''
            GROUP BY token ORDER BY n DESC, token LIMIT 50""")
  )

  // ---------------------------------------------------------------- q25
  /** Per-document quality scoring: token count, BPE-ish subtoken count
    * (regex `[a-z]+|[0-9]+|[^a-z0-9 ]`), average token length, stopword
    * ratio, and a categorical quality label. Pure per-row expressions —
    * narrow, codegen'd, no shuffle at all.
    */
  val q25 = QuerySpec(
    "q25_text_quality",
    (s, d) => {
      val ts = split(asciiLower(col("text")), " ")
      val nTok = size(ts)
      val stopRatio = ffloor(
        size(filter(ts, t => t.isin(StopWords: _*))).cast("double") / nTok, 4)
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
            .as("n_subtokens"),
          ffloor(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 2)
            .as("avg_token_len"),
          stopRatio.as("stopword_ratio"),
          when(nTok.between(20, 300) && stopRatio < 0.15, "good")
            .otherwise("poor").as("quality"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
              CAST(len(string_split(${asciiLowerSql("text")}, ' ')) AS INTEGER) AS n_tokens,
              CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subtokens,
              CAST(FLOOR(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
                / len(string_split(${asciiLowerSql("text")}, ' ')) * 100.0) AS DOUBLE) / 100.0 AS avg_token_len,
              CAST(FLOOR(CAST(len(list_filter(string_split(${asciiLowerSql("text")}, ' '),
                  t -> t IN ('the', 'a'))) AS DOUBLE)
                / len(string_split(${asciiLowerSql("text")}, ' ')) * 10000.0) AS DOUBLE) / 10000.0 AS stopword_ratio,
              CASE WHEN len(string_split(${asciiLowerSql("text")}, ' ')) BETWEEN 20 AND 300
                    AND CAST(FLOOR(CAST(len(list_filter(string_split(${asciiLowerSql("text")}, ' '),
                        t -> t IN ('the', 'a'))) AS DOUBLE)
                      / len(string_split(${asciiLowerSql("text")}, ' ')) * 10000.0) AS DOUBLE) / 10000.0 < 0.15
                   THEN 'good' ELSE 'poor' END AS quality
            FROM documents ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q26
  /** Language-ID: the oracled query uses a deterministic stopword-presence
    * rule (confusion counts vs the labeled `lang` column); the richer
    * char-n-gram scorer is [[langIdScore]] below (ScalaTest-covered).
    */
  val q26 = QuerySpec(
    "q26_lang_id",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("lang"),
          when(col("text").contains(" the ") || col("text").startsWith("the "), "en")
            .otherwise("unk").as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred"),
    Some("""SELECT lang,
              CASE WHEN text LIKE '% the %' OR text LIKE 'the %'
                   THEN 'en' ELSE 'unk' END AS lang_pred,
              COUNT(*) AS n
            FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred""")
  )

  /** Char-trigram language scorer: fraction of a doc's char-trigrams that
    * appear in a per-language reference profile (top trigrams). Returns
    * doc_id, lang guess + score. Hash-based profile → not oracled.
    */
  def langIdScore(docs: DataFrame, profiles: Map[String, Seq[String]]): DataFrame = {
    require(profiles.nonEmpty, "langIdScore needs at least one language profile")
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val hits = grams.map(g => when(col("text").contains(g), 1).otherwise(0))
        .reduce[Column](_ + _)
      struct(hits.cast("double").as("score"), lit(lang).as("lang"))
    }
    // greatest() needs ≥2 args; a single profile is its own argmax
    val best = if (scores.size == 1) scores.head else greatest(scores: _*)
    docs.select(col("doc_id"),
      best.getField("lang").as("lang_pred"),
      best.getField("score").as("score"))
  }

  // ---------------------------------------------------------------- q28
  /** Document fingerprinting: whitespace-normalized MD5 content hash plus
    * the count of docs sharing the fingerprint (exact-dup cluster size).
    * MD5 is identical across engines → oracled. The rolling-hash winnowing
    * variant is [[winnowFingerprints]].
    */
  val q28 = QuerySpec(
    "q28_doc_fingerprint",
    (s, d) => {
      // single scan: cluster size via a window over the fingerprint, not a
      // groupBy + self-join (which would scan and hash the corpus twice)
      // explicit whitespace class: Java \s ≠ RE2 \s (see CorpusPipeline)
      val fp = md5(regexp_replace(asciiLower(col("text")), "[ \\t\\n\\r\\f]+", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), fp.as("fingerprint"))
        .withColumn("n_same",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
              md5(regexp_replace(${asciiLowerSql("text")}, '[ \t\n\r\f]+', ' ', 'g')) AS fingerprint,
              COUNT(*) OVER (PARTITION BY md5(regexp_replace(${asciiLowerSql("text")}, '[ \t\n\r\f]+', ' ', 'g'))) AS n_same
            FROM documents ORDER BY doc_id""")
  )

  /** TRUE sliding-window winnowing (Schleimer/Wilkerson/Aiken): hash every
    * `window`-token k-gram span, then keep the minimum of EVERY run of `w`
    * consecutive span hashes — `min over (rows between w-1 preceding and
    * current row)` per document, distinct.
    *
    * GUARANTEE (the one fixed-stride blocked minima lacks): every window
    * of w consecutive span hashes contributes its minimum, so two
    * documents sharing ANY token run of length ≥ window + w - 1 share at
    * least one fingerprint — independent of where the run falls. Blocked
    * minima miss overlaps that straddle a block boundary with unlucky
    * alignment; a sliding frame has no boundaries to straddle.
    *
    * Scale shape: one shuffle on doc_id (the same shuffle the span build
    * already does — both windows share the partitioning), sliding min is
    * a linear per-partition pass, sketch size is the number of distinct
    * window minima ≈ 2·spans/(w+1) per doc. Docs with fewer than w spans
    * keep one fingerprint (the min of all their spans) — short docs stay
    * representable instead of silently dropping out.
    */
  def winnowFingerprints(docs: DataFrame, window: Int = 5, w: Int = 4): DataFrame = {
    require(w >= 1, "winnow window w must be >= 1")
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val sliding = byDoc.orderBy("pos").rowsBetween(-(w - 1), 0)
    Dedup.shinglesWithPos(docs, window)
      .select(col("doc_id"), col("pos"), xxhash64(col("shingle")).as("h"))
      .withColumn("__maxpos", max("pos").over(byDoc))
      .withColumn("__fp", min("h").over(sliding))
      // complete windows only — except short docs (maxpos < w-1), which
      // keep their final row: the min over everything they have
      .filter(col("pos") >= least(lit(w - 1), col("__maxpos")))
      .select(col("doc_id"), col("__fp").as("fingerprint"))
      .distinct()
  }

  /** (doc_id, term, tf): the term-frequency table q55 and q56 both start
    * from — one fanned-out tokenize pass + one (doc, term) aggregate.
    */
  private def termFreq(docs: DataFrame): DataFrame =
    fanOut(docs)
      .select(col("doc_id"), explode(split(asciiLower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  // ---------------------------------------------------------------- q55
  /** TF-IDF: top-3 scoring terms per document. The canonical three-shuffle
    * plan: (doc, term) tf aggregate → per-term document frequency (small:
    * one row per vocab term) → join back + per-doc top-k window. N comes
    * from a broadcast single-row aggregate (no collect). Ranked by the
    * TRUNCATED score on both engines so a sub-ulp ln() divergence can
    * never flip an ordering the oracle disagrees with.
    */
  val q55 = QuerySpec(
    "q55_tfidf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // tf feeds the df aggregate AND the scoring join probe — materialize
      // once (round 15, q107/q165's idiom: a second corpus tokenization
      // pass is the dominant cost at scale, and AQE exchange reuse across
      // aliased subtrees is measured-intermittent in this engine).
      val tf = graft.core.Materialize(termFreq(docs))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val score = ffloor(
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 4)
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), score.as("tfidf"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"), col("tfidf"))
        .orderBy("doc_id", "rn")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
                   WHERE term <> '' GROUP BY 1, 2),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT COUNT(*) AS n_docs FROM documents),
            scored AS (
              SELECT doc_id, term,
                CAST(FLOOR(CAST(tf AS DOUBLE)
                  * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
                  * 10000.0) AS DOUBLE) / 10000.0 AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN n)
            SELECT doc_id, rn, term, tfidf FROM (
              SELECT doc_id, term, tfidf,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term) AS rn
              FROM scored)
            WHERE rn <= 3 ORDER BY doc_id, rn""")
  )

  // ---------------------------------------------------------------- q56
  /** Repetition-quality signal (the Gopher-style duplicate-content rule):
    * per document, token count, distinct-token count, duplicate-token
    * ratio, and the share of the single most repeated token. Two chained
    * aggregates — the (doc, term) partial collapses the token stream
    * before anything wide happens, so the second shuffle carries one row
    * per distinct (doc, term).
    */
  val q56 = QuerySpec(
    "q56_repetition",
    (s, d) =>
      termFreq(Tables.documents(s, d)).groupBy("doc_id")
        .agg(sum("tf").as("n_tokens"), count(lit(1)).as("n_distinct"),
          max("tf").as("max_tf"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_distinct"),
          ffloor(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4)
            .as("dup_ratio"),
          ffloor(col("max_tf").cast("double") / col("n_tokens"), 4)
            .as("top_token_share"))
        .orderBy("doc_id"),
    Some(s"""WITH tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM (
                SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
                FROM documents)
              WHERE term <> '' GROUP BY 1, 2)
            SELECT doc_id,
              CAST(SUM(tf) AS BIGINT) AS n_tokens,
              COUNT(*) AS n_distinct,
              CAST(FLOOR((1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(tf) AS BIGINT))
                * 10000.0) AS DOUBLE) / 10000.0 AS dup_ratio,
              CAST(FLOOR(CAST(MAX(tf) AS DOUBLE) / CAST(SUM(tf) AS BIGINT)
                * 10000.0) AS DOUBLE) / 10000.0 AS top_token_share
            FROM tf GROUP BY doc_id ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q57
  /** Winnowing partial-overlap candidates: doc pairs sharing ≥ `minShared`
    * winnowing fingerprints from [[winnowFingerprints]] — catches documents
    * that share a long span (quote, boilerplate, plagiarized section) even
    * when whole-document measures (Jaccard/MinHash) stay low. Any shared
    * token run of length ≥ window + w - 1 is guaranteed a shared
    * fingerprint (see winnowFingerprints). Same scale shape as every other
    * near-dup operator: candidates come from an equi-join on the
    * fingerprint (shuffle key = fingerprint), hot fingerprints are capped,
    * and the per-doc sketch is materialized once for both join sides.
    * xxhash-based → rows-only driver check; span-sharing semantics are
    * asserted in ScalaTest.
    */
  def winnowingOverlapPairs(docs: DataFrame, window: Int = 5, w: Int = 4,
                            minShared: Int = 2, maxDocFreq: Int = 1000,
                            auditOnly: Boolean = false): DataFrame = {
    // w = 1 collapses the sliding min to the FULL distinct k-gram set —
    // no winnowing compression at all, so the fingerprint join degrades
    // toward the uncompressed shingle join. That config exists solely
    // for the q247 exactness audit and must be unreachable by accident
    // at scale — callers opt in with auditOnly = true (round-9 verdict
    // item 3).
    require(w > 1 || auditOnly,
      "winnowingOverlapPairs: w = 1 disables winnowing (full k-gram " +
        "set per document — audit configuration); pass auditOnly = true " +
        "on a bounded fixture to use it")
    // winnowFingerprints is already distinct per doc — a fingerprint
    // recurring across several windows of ONE doc counts once, so
    // shared_fps never double-counts window pairings
    val fp = graft.core.Materialize(graft.operators.Ops
      .capKeyFreq(winnowFingerprints(docs, window, w),
        maxDocFreq, col("fingerprint")))
    fp.as("x").join(fp.as("y"),
        col("x.fingerprint") === col("y.fingerprint") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy("d1", "d2")
  }

  val q57 = QuerySpec(
    "q57_winnowing_overlap",
    (s, d) => winnowingOverlapPairs(Tables.documents(s, d)),
    None
  )

  // ---------------------------------------------------------------- q247
  /** Oracled EXACTNESS audit for the winnowing machinery — [[q57]]'s
    * driver-checkable twin (the q244 degenerate-config pattern): with
    * w = 1 the sliding minimum runs over a single span hash, so
    * [[winnowFingerprints]]' sketch is exactly the distinct 5-gram hash
    * set per document, and [[winnowingOverlapPairs]]' report collapses to
    * "pairs sharing ≥ minShared distinct 5-grams under the doc-freq cap"
    * — which DuckDB replays on the grams themselves (q27's shingle SQL at
    * k = 5, including the identical QUALIFY cap). Exercises the whole q57
    * pipeline — span build, window frame + short-doc guard, per-doc
    * distinct, capKeyFreq, fingerprint equi-join, minShared filter —
    * leaving only the w>1 min-selection itself un-oracled (its span-
    * sharing guarantee is asserted in LlmOpsSpec).
    *
    * Hash honesty: the audit equates shared-HASH counts (Spark) with
    * shared-GRAM counts (DuckDB), so an xxhash64 collision between two
    * distinct observed grams would FAIL the row — the audit errs loud,
    * never silently green. At ~10⁶ distinct grams the collision odds are
    * ~10⁻⁷, and the corpora are fixed, so a pass is stable evidence.
    */
  val q247 = QuerySpec(
    "q247_winnowing_exactness_audit",
    (s, d) => winnowingOverlapPairs(Tables.documents(s, d), window = 5, w = 1,
      auditOnly = true),
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 5),
            g_all AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 3),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' ||
                         ts[i+3] || '_' || ts[i+4])) AS g
                FROM toks)),
            g AS (
              SELECT doc_id, g FROM g_all
              QUALIFY COUNT(*) OVER (PARTITION BY g) <= 1000)
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_fps
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2
            ORDER BY d1, d2""")
  )

  // ------------------------------------------------------ PII redaction
  /** Chained global regex redaction: emails, then IPv4, then phone-shaped
    * tokens. Order matters — an email contains digits and dots that the
    * later patterns must never see. Pure per-row `regexp_replace` chain:
    * narrow, codegen'd, embarrassingly parallel — the 100 TB shape is a
    * straight scan. Patterns stay in the RE2 ∩ java.util.regex common
    * subset so the DuckDB oracle runs them verbatim.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b555-\\d{4}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** q65: PII redaction over synthesized-contaminated text — the corpus
    * has no PII (it's synthetic words), so the query first SPLICES
    * deterministic PII (an email, an IPv4, a phone number derived from
    * doc_id) into each document, then redacts it. The oracle rebuilds the
    * same contaminated string and applies the same regexes, so the hash
    * match proves the redaction itself — multi-occurrence, global, in
    * order — not just plumbing (the q63 synth→parse pattern).
    */
  val q65 = QuerySpec(
    "q65_pii_redaction",
    (s, d) => {
      val id = col("doc_id")
      val dirty = concat(col("text"),
        lit(" reach user"), id.cast("string"), lit("@mail.example.com or "),
        lit("10."), (id % 256).cast("string"), lit("."),
        ((id * 7) % 256).cast("string"), lit("."),
        ((id * 13) % 256).cast("string"),
        lit(" tel 555-"), lpad((id % 10000).cast("string"), 4, "0"))
      Tables.documents(s, d)
        .select(id, redactPii(dirty).as("clean"))
        .withColumn("n_redacted",
          (length(col("clean")) - length(translate(col("clean"), "<", "")))
            .cast("long"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(
                text || ' reach user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.com or '
                     || '10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                     || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                '$EmailRe', '<EMAIL>', 'g'),
                '$Ipv4Re', '<IP>', 'g'),
                '$PhoneRe', '<PHONE>', 'g') AS clean,
              length(regexp_replace(regexp_replace(regexp_replace(
                text || ' reach user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.com or '
                     || '10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                     || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                '$EmailRe', '<EMAIL>', 'g'),
                '$Ipv4Re', '<IP>', 'g'),
                '$PhoneRe', '<PHONE>', 'g'))
              - length(replace(regexp_replace(regexp_replace(regexp_replace(
                text || ' reach user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.com or '
                     || '10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                     || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                '$EmailRe', '<EMAIL>', 'g'),
                '$Ipv4Re', '<IP>', 'g'),
                '$PhoneRe', '<PHONE>', 'g'), '<', '')) AS n_redacted
            FROM documents ORDER BY doc_id""")
  )

  // ------------------------------------------------------ corpus profile
  /** q66: per-language corpus profile — the dataset-card statistics pass
    * (docs, token volume, length distribution) every curated corpus
    * ships with. One fanned-out tokenize-count + one mergeable aggregate:
    * counts, sums, and interpolated quantiles (exact `percentile`, the
    * q43 cross-engine idiom) over n_chars. No window — quantiles come
    * from the aggregate form, so strata never serialize into one task
    * (contrast q59's rank window; at 100 TB this stays two shuffles of
    * |langs| rows).
    */
  val q66 = QuerySpec(
    "q66_corpus_profile",
    (s, d) =>
      fanOut(Tables.documents(s, d))
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("tokens").as("total_tokens"),
          ffloor(avg("n_chars"), 2).as("avg_chars"),
          ffloor(expr("percentile(n_chars, 0.5)"), 2).as("p50_chars"),
          ffloor(expr("percentile(n_chars, 0.9)"), 2).as("p90_chars"))
        .orderBy("lang"),
    Some("""SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              CAST(FLOOR(AVG(n_chars) * 100.0) AS DOUBLE) / 100.0 AS avg_chars,
              CAST(FLOOR(quantile_cont(n_chars, 0.5) * 100.0) AS DOUBLE) / 100.0 AS p50_chars,
              CAST(FLOOR(quantile_cont(n_chars, 0.9) * 100.0) AS DOUBLE) / 100.0 AS p90_chars
            FROM documents GROUP BY lang ORDER BY lang""")
  )

  // ---------------------------------------------------------------- q78
  /** q78: per-document n-gram NOVELTY — the fraction of a doc's distinct
    * 5-grams appearing in no other document (df = 1). The inverse signal
    * of q68's boilerplate list: high novelty = original content, low =
    * template/boilerplate-assembled; curation mixes weight novel text up.
    *
    * SCALE SHAPE: the df table rides the same shingle-keyed shuffle its
    * aggregate needs; the join back is 1:1 on shingle (df is one row per
    * distinct shingle — no quadratic candidate blowup, so unlike q27/q69
    * this needs no frequency cap), then one doc-keyed aggregate. Docs
    * with < 5 tokens have no 5-grams and drop out, matching the oracle's
    * `len >= 5` guard.
    */
  val q78 = QuerySpec(
    "q78_ngram_novelty",
    (s, d) => {
      val g = graft.core.Materialize(
        Dedup.shingles(Tables.documents(s, d), 5))
      val dfT = g.groupBy("shingle").agg(count(lit(1)).as("df"))
      g.join(dfT, "shingle")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_grams"),
          count(when(col("df") === 1, 1)).as("n_novel"))
        .withColumn("novelty",
          ffloor(col("n_novel").cast("double") / col("n_grams"), 4))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 5),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 3),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                      || '_' || ts[i+4])) AS g
                FROM toks)),
            dft AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
            SELECT doc_id, COUNT(*) AS n_grams,
              COUNT(CASE WHEN df = 1 THEN 1 END) AS n_novel,
              CAST(FLOOR(COUNT(CASE WHEN df = 1 THEN 1 END) * 1.0 / COUNT(*)
                * 10000.0) AS DOUBLE) / 10000.0 AS novelty
            FROM grams JOIN dft USING (g)
            GROUP BY doc_id ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q80
  /** q80: per-language VOCABULARY COVERAGE — how many distinct token
    * types cover 95% of all token occurrences, plus type count and
    * type-token ratio. The dataset-card numbers a tokenizer-training run
    * reads first (a tiny v95 = repetitive corpus; TTR near 1 = noise).
    *
    * SCALE SHAPE: the explode aggregates straight down to the VOCABULARY
    * grain (map-side partials; shuffle is vocab-sized, not corpus-sized)
    * and every window after that runs on the per-language vocab table —
    * bounded by |vocab|, which is millions where the corpus is billions.
    * The cumulative-coverage window is ordered (n desc, token), a total
    * order, so both engines rank identically; stats broadcast back like
    * q70's thresholds.
    */
  val q80 = QuerySpec(
    "q80_vocab_coverage",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .repartition(col("doc_id")) // parallelize the explode past one split
        .select(col("lang"), explode(split(asciiLower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      val stats = toks.groupBy("lang").agg(sum("n").as("total"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("cum", sum("n").over(w))
        .join(broadcast(stats), "lang")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_types"),
          max("cum").cast("long").as("total_tokens"),
          (count(when(col("cum") < col("total") * 0.95, 1)) + 1).as("v95_types"),
          ffloor(count(lit(1)).cast("double") / max("cum"), 6).as("ttr"))
        .orderBy("lang")
    },
    Some(s"""WITH tok AS (
              SELECT lang, t AS token, COUNT(*) AS n FROM (
                SELECT lang, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t
                FROM documents)
              WHERE t <> '' GROUP BY lang, t),
            stats AS (SELECT lang, SUM(n) AS total FROM tok GROUP BY lang),
            ranked AS (
              SELECT lang, n, token,
                SUM(n) OVER (PARTITION BY lang ORDER BY n DESC, token
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM tok)
            SELECT lang, COUNT(*) AS n_types,
              CAST(MAX(cum) AS BIGINT) AS total_tokens,
              COUNT(CASE WHEN cum < total * 0.95 THEN 1 END) + 1 AS v95_types,
              CAST(FLOOR(COUNT(*) * 1.0 / MAX(cum) * 1000000.0) AS DOUBLE) / 1000000.0 AS ttr
            FROM ranked JOIN stats USING (lang)
            GROUP BY lang ORDER BY lang""")
  )

  // --------------------------------------------------------------- q112
  /** Degenerate-repetition detector — the decoding-loop artifact check a
    * synthetic-data pipeline runs before training on model outputs:
    * q56's duplicate-token ratios measure GLOBAL duplication; this finds
    * the longest CONSECUTIVE repetition runs — period-1 ("the the the",
    * max run of tok == lag(tok)) and period-2 ("a b a b a b", runs of
    * tok == lag(tok, 2), cycle length run+2) — the signatures of greedy-
    * decoding loops. Both are gaps-and-islands over doc-local windows
    * (partition by doc_id, bounded by document length); docs with no
    * repeats report run 1 / cycle 2 via the left-join default.
    *
    * Output is per-doc metrics for docs showing ANY period-1 repeat or a
    * period-2 cycle of ≥ 4 — bounded by affected docs, the q109 output
    * discipline.
    */
  val q112 = QuerySpec(
    "q112_repetition_loops",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val toks = Dedup.tokensWithPos(Tables.documents(s, d))
      def maxRun(lagBy: Int, colName: String) = {
        val matches = toks
          .withColumn("m", col("tok") === lag("tok", lagBy).over(wDoc))
          .filter(col("m"))
        matches
          .withColumn("grp", col("pos") - row_number().over(wDoc))
          .groupBy(col("doc_id"), col("grp"))
          .agg(count(lit(1)).as("run"))
          .groupBy("doc_id")
          .agg((max("run") + lit(lagBy)).as(colName))
      }
      val docs = toks.select("doc_id").distinct()
      docs
        .join(maxRun(1, "max_rep_run"), Seq("doc_id"), "left")
        .join(maxRun(2, "max_cycle_len"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("max_rep_run"), lit(1L)).as("max_rep_run"),
          coalesce(col("max_cycle_len"), lit(2L)).as("max_cycle_len"))
        .filter(col("max_rep_run") >= 2 || col("max_cycle_len") >= 4)
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, i AS pos, ts[i] AS tok
              FROM (SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts,
                      unnest(range(1, len(string_split(${asciiLowerSql("text")}, ' ')) + 1)) AS i
                    FROM documents)),
            m1 AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos, tok,
                  LAG(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS l1
                FROM toks)
              WHERE tok = l1),
            r1 AS (
              SELECT doc_id, MAX(run) + 1 AS max_rep_run FROM (
                SELECT doc_id, COUNT(*) AS run FROM (
                  SELECT doc_id, pos,
                    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                  FROM m1)
                GROUP BY doc_id, grp)
              GROUP BY doc_id),
            m2 AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos, tok,
                  LAG(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS l2
                FROM toks)
              WHERE tok = l2),
            r2 AS (
              SELECT doc_id, MAX(run) + 2 AS max_cycle_len FROM (
                SELECT doc_id, COUNT(*) AS run FROM (
                  SELECT doc_id, pos,
                    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                  FROM m2)
                GROUP BY doc_id, grp)
              GROUP BY doc_id),
            ids AS (SELECT DISTINCT doc_id FROM toks)
            SELECT ids.doc_id,
              COALESCE(r1.max_rep_run, 1) AS max_rep_run,
              COALESCE(r2.max_cycle_len, 2) AS max_cycle_len
            FROM ids
            LEFT JOIN r1 ON ids.doc_id = r1.doc_id
            LEFT JOIN r2 ON ids.doc_id = r2.doc_id
            WHERE COALESCE(r1.max_rep_run, 1) >= 2
               OR COALESCE(r2.max_cycle_len, 2) >= 4
            ORDER BY ids.doc_id""")
  )

  // --------------------------------------------------------------- q126
  /** Bigram PMI collocations — the multi-word-expression miner ("new
    * york", "machine learning") used for tokenizer vocab candidates and
    * phrase-aware dedup keys. Marginals come from the bigram table itself
    * (first-position and second-position counts), so the corpus is
    * scanned once for pairs and never again; PMI = ln(c12·N / (c1·c2))
    * is truncated to integer micro-nats (q93's determinism contract — the
    * ratio is a pure-integer-derived double, identical on both engines)
    * and the top 100 by (pmi, w1, w2) ships via TakeOrderedAndProject —
    * per-partition heaps, no global sort. Noise floor: pairs seen < 5
    * times are dropped before ranking (PMI of rare pairs is degenerate).
    */
  val q126 = QuerySpec(
    "q126_bigram_pmi",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val pairs = Dedup.tokensWithPos(Tables.documents(s, d))
        .select(col("doc_id"), col("tok").as("w1"),
          lead(col("tok"), 1).over(w).as("w2"))
        .filter(col("w2").isNotNull)
      val c12 = graft.core.Materialize(
        pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
      val c1 = c12.groupBy("w1").agg(sum("c12").cast("long").as("c1"))
      val c2 = c12.groupBy("w2").agg(sum("c12").cast("long").as("c2"))
      val nTot = c12.agg(sum("c12").cast("long").as("nb"))
      c12.filter(col("c12") >= 5)
        .join(c1, "w1").join(c2, "w2")
        .crossJoin(broadcast(nTot))
        .select(col("w1"), col("w2"), col("c12"),
          floor(log(
            (col("c12").cast("double") * col("nb").cast("double")) /
              (col("c1").cast("double") * col("c2").cast("double"))) * lit(1e6))
            .cast("long").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        .limit(100)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents),
            p AS (
              SELECT ts[i] AS w1, ts[i+1] AS w2
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks)),
            c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY 1, 2),
            c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
            c2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
            n AS (SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM c12)
            SELECT w1, w2, c12,
              CAST(FLOOR(ln((CAST(c12 AS DOUBLE) * CAST(nb AS DOUBLE))
                / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) * 1000000.0)
                AS BIGINT) AS pmi_micro
            FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
            WHERE c12 >= 5
            ORDER BY pmi_micro DESC, w1, w2 LIMIT 100""")
  )

  // --------------------------------------------------------------- q214
  /** Zipf rank-frequency FIT — the exponent and goodness-of-fit that
    * q89's log-bucketed spectrum does not give: OLS slope and R2 of
    * ln(freq) against ln(rank) over the top-20 terms. Natural text fits
    * slope ~ -1 with high R2; this synthetic flat vocabulary fits near 0
    * — the one-number version of q147's measured negative result (a
    * rarity prefix cannot prune a corpus whose Zipf slope is ~0), and
    * the statistic a tokenizer/vocab planner reads next to Heaps' q199.
    *
    * Scale: one vocab-bounded count aggregate, a TakeOrderedAndProject
    * top-20, and a 20-row fit (the rank window sees 20 rows, never the
    * vocabulary). Determinism: q156/q163's discipline — ln() of exact
    * integers micro-floored to longs, exact long sufficient sums, the
    * two divisions last, degenerate denominators (one term; constant
    * frequency) yielding NULL in both engines.
    */
  val q214 = QuerySpec(
    "q214_zipf_slope",
    (s, d) => {
      val tc = fanOut(Tables.documents(s, d))
        .select(explode(split(asciiLower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("c"))
      val top = tc.orderBy(col("c").desc, col("term")).limit(20)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("c").desc, col("term"))))
        .select(
          floor(log(col("rk").cast("double")) * lit(1e6)).cast("long").as("x"),
          floor(log(col("c").cast("double")) * lit(1e6)).cast("long").as("y"))
      val dx = col("n") * col("sxx") - col("sx") * col("sx")
      val dy = col("n") * col("syy") - col("sy") * col("sy")
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      top.agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n").as("n_points"),
          when(dx === 0, lit(null)).otherwise(
            ffloor(num.cast("double") / dx.cast("double"), 6)).as("zipf_slope"),
          when(dx === 0 || dy === 0, lit(null)).otherwise(
            ffloor((num.cast("double") * num.cast("double")) /
              (dx.cast("double") * dy.cast("double")), 6)).as("zipf_r2"))
    },
    Some(s"""WITH tc AS (
              SELECT t.term, COUNT(*) AS c FROM documents,
                unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t(term)
              WHERE t.term <> '' GROUP BY 1),
            top AS (
              SELECT CAST(FLOOR(ln(CAST(ROW_NUMBER() OVER
                  (ORDER BY c DESC, term) AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
                CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
              FROM (SELECT term, c FROM tc ORDER BY c DESC, term LIMIT 20)),
            sums AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy
              FROM top)
            SELECT n AS n_points,
              CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS DOUBLE)
                  / 1000000.0 END AS zipf_slope,
              CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
                ELSE CAST(FLOOR(
                  (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
                  / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
                  * 1000000.0) AS DOUBLE) / 1000000.0 END AS zipf_r2
            FROM sums""")
  )

  val all: Seq[QuerySpec] =
    Seq(q23, q25, q26, q28, q55, q56, q57, q65, q66, q78, q80, q112, q126, q214, q247)
}
