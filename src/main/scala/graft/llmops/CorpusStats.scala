package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops._
import CorpusPipeline.{hashFrac, normalize, WhitespaceClass}

/** Corpus-profiling and sampling-design operators: character-class makeup,
  * token entropy, LSH-candidate quality audit, variance-optimal (Neyman)
  * stratified allocation, and blocked exact cosine range search.
  *
  * Everything here follows the engine's determinism contract (Ops.scala):
  * exact integer/decimal sums first, a FIXED IEEE op sequence on those
  * exact operands second, ffloor truncation last — that is what lets a
  * double-valued statistic (entropy, z, allocation rate) be hash-compared
  * against DuckDB bit-for-bit.
  *
  * The reference connector has no analytics surface (SURVEY.md §2.7);
  * these queries are part of the engine's own inventory.
  */
object CorpusStats {

  // --------------------------------------------------------------- q136
  /** Per-source character-class profile: what fraction of the corpus
    * bytes are digits / letters / spaces — the first diagnostic a corpus
    * curator pulls when a source's quality drifts (code vs prose vs
    * tables shifts these ratios hard). Class counts are length deltas
    * after class-deletion (`regexp_replace(.., '')`) — pure per-row
    * narrow expressions; one small aggregate per source; ratios divide
    * exact integer sums.
    */
  val q136 = QuerySpec(
    "q136_charclass_profile",
    (s, d) => {
      val n = length(col("text"))
      def without(cls: String): Column = length(regexp_replace(col("text"), cls, ""))
      Tables.documents(s, d)
        .select(col("source"), n.as("n"),
          (n - without("[0-9]")).as("dig"),
          (n - without("[a-zA-Z]")).as("alp"),
          (n - without("[ ]")).as("spc"))
        .groupBy("source")
        .agg(
          sum(col("n")).cast("long").as("total_chars"),
          ffloor(sum(col("dig")).cast("double") / sum(col("n")), 6).as("digit_ratio"),
          ffloor(sum(col("alp")).cast("double") / sum(col("n")), 6).as("alpha_ratio"),
          ffloor(sum(col("spc")).cast("double") / sum(col("n")), 6).as("space_ratio"))
        .orderBy("source")
    },
    Some("""WITH per AS (
              SELECT source, length(text) AS n,
                length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
                length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS alp,
                length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS spc
              FROM documents)
            SELECT source, CAST(SUM(n) AS BIGINT) AS total_chars,
              CAST(FLOOR(CAST(SUM(dig) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0 AS digit_ratio,
              CAST(FLOOR(CAST(SUM(alp) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0 AS alpha_ratio,
              CAST(FLOOR(CAST(SUM(spc) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0 AS space_ratio
            FROM per GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q137
  /** Per-source Shannon token entropy — the "is this source degenerate
    * boilerplate or diverse text" score (low entropy → template spam;
    * it also upper-bounds achievable compression, i.e. token value per
    * byte). Plan: one (source, token) count aggregate (map-side combined),
    * one per-source rollup. H = Σ (cnt/total)·ln(total/cnt), computed as
    * q93's micro-nat contract: per-DISTINCT-token surprisal truncated to
    * integer micro-nats, weighted by exact counts in a LONG sum, one
    * double division at the very end — cross-engine-stable because the
    * only transcendental sits behind an integer truncation.
    */
  val q137 = QuerySpec(
    "q137_token_entropy",
    (s, d) => {
      val toks = normalize(Tables.documents(s, d))
        .select(col("source"), explode(split(col("text_norm"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val cnts = toks.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      val tot = cnts.groupBy("source")
        .agg(sum(col("cnt")).cast("long").as("total"),
          count(lit(1)).as("n_distinct"))
      val sMicro = floor(log(col("total").cast("double") / col("cnt")) * lit(1e6))
        .cast("long")
      cnts.join(broadcast(tot), "source")
        .select(col("source"), col("total"), col("n_distinct"),
          (col("cnt") * sMicro).as("term"))
        .groupBy("source", "total", "n_distinct")
        .agg(sum(col("term")).cast("long").as("hm"))
        .select(col("source"), col("total"), col("n_distinct"),
          ffloor(col("hm").cast("double") / lit(1e6) / col("total"), 4)
            .as("entropy_nats"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
              SELECT source, t.tok FROM documents,
                UNNEST(string_split(regexp_replace(${asciiLowerSql("text")},
                  '$WhitespaceClass', ' ', 'g'), ' ')) AS t(tok)
              WHERE length(t.tok) > 0),
            cnts AS (SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
            tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total,
                      COUNT(*) AS n_distinct FROM cnts GROUP BY 1)
            SELECT c.source, total, n_distinct,
              CAST(FLOOR(CAST(SUM(cnt * CAST(FLOOR(ln(CAST(total AS DOUBLE) / cnt)
                  * 1000000.0) AS BIGINT)) AS DOUBLE)
                / 1000000.0 / total * 10000.0) AS DOUBLE) / 10000.0 AS entropy_nats
            FROM cnts c JOIN tot USING (source)
            GROUP BY c.source, total, n_distinct
            ORDER BY c.source""")
  )

  // --------------------------------------------------------------- q140
  /** Neyman (variance-optimal) stratified allocation + hash-threshold
    * sample: stratum h gets sampling mass ∝ N_h·S_h (size × std-dev of
    * n_chars), the allocation that minimizes estimator variance for a
    * fixed budget — the statistically-right way to subsample a mixed
    * corpus for eval. Two passes: (1) one G-row moment aggregate (exact
    * long sums → fixed-IEEE variance → ffloor'd weight → exact decimal
    * weight total); (2) per-row membership by salted-hash threshold
    * (q61's primitive) at the stratum's rate — no window, no sort, no
    * stratum ever resident in one task. Single-stratum degenerate cases
    * (N_h < 2) get weight 0 by the guarded CASE.
    */
  val q140 = QuerySpec(
    "q140_neyman_sample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val budgetFrac = 0.3
      val nc = col("n_chars").cast("double")
      // s2 exactness bound (q150's discipline): the per-row square is exact
      // while n_chars < 2^26.5 ≈ 9.4e7 (square < 2^53, double-representable
      // before the long cast), and the long sum holds while
      // Σ n_chars² < 2^63 — i.e. ≥ 1e3 rows of ~9.4e7 chars or ~1e9 rows of
      // ~3e6 chars. Documents beyond ~94 MB of text violate the schema's own
      // invariants long before this; past the bound Spark wraps where DuckDB
      // rounds, so widen to sum(decimal(38,0)) if the corpus ever gets there.
      val mom = docs.groupBy("source").agg(
        count(lit(1)).as("nh"),
        sum(col("n_chars")).cast("long").as("s1"),
        sum((nc * nc).cast("long")).cast("long").as("s2"))
      val varh = (col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / col("nh")) /
        (col("nh") - 1)
      val wh = when(col("nh") > 1,
        ffloor(col("nh") * sqrt(greatest(varh, lit(0.0))), 4)).otherwise(lit(0.0))
      val weights = mom.select(col("source"), col("nh"), wh.as("w"))
      val wtot = weights.agg(
        sum(col("w").cast(DecimalType(30, 10))).cast("double").as("wt"),
        sum(col("nh")).cast("long").as("ntot"))
      val rated = weights.crossJoin(broadcast(wtot))
        .select(col("source"), col("nh"),
          least(lit(1.0),
            lit(budgetFrac) * col("ntot") * (col("w") / col("wt")) / col("nh"))
            .as("rate"))
      // Saturated strata (least(1.0,...) clamps to exactly 1.0) must keep
      // ALL rows: hex(2^32) is 9 chars and lpad-TRUNCATES to '10000000',
      // silently sampling ~6.25% instead of 100%. 'g' sorts after every hex
      // digit → keep-all, matching rateCutoffHex's documented contract.
      val cutoff = when(col("rate") >= 1.0, lit("g"))
        .otherwise(lpad(lower(hex(floor(col("rate") * lit(4294967296.0))
          .cast("long"))), 8, "0"))
      docs.join(broadcast(rated), "source")
        .filter(hashFrac(col("doc_id"), "neyman") < cutoff)
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).cast("long").as("sampled_chars"),
          ffloor(first(col("rate")), 6).as("rate6"))
        .orderBy("source")
    },
    Some("""WITH mom AS (
              SELECT source, COUNT(*) AS nh,
                CAST(SUM(n_chars) AS BIGINT) AS s1,
                CAST(SUM(CAST(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE) AS BIGINT)) AS BIGINT) AS s2
              FROM documents GROUP BY source),
            wts AS (
              SELECT source, nh,
                CASE WHEN nh > 1 THEN
                  CAST(FLOOR(nh * sqrt(GREATEST(
                    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nh)
                      / (nh - 1), 0.0)) * 10000.0) AS DOUBLE) / 10000.0
                ELSE 0.0 END AS w
              FROM mom),
            tot AS (
              SELECT CAST(SUM(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS wt,
                CAST(SUM(nh) AS BIGINT) AS ntot
              FROM wts),
            rated AS (
              SELECT source, nh,
                LEAST(1.0, 0.3 * ntot * (w / wt) / nh) AS rate
              FROM wts, tot)
            SELECT d.source, COUNT(*) AS n_sampled,
              CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
              CAST(FLOOR(ANY_VALUE(rate) * 1000000.0) AS DOUBLE) / 1000000.0 AS rate6
            FROM documents d JOIN rated r ON d.source = r.source
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':neyman'), 1, 8)
                  < CASE WHEN rate >= 1.0 THEN 'g'
                    ELSE lpad(lower(to_hex(CAST(FLOOR(rate * 4294967296.0) AS BIGINT))), 8, '0') END
            GROUP BY d.source ORDER BY d.source""")
  )

  // --------------------------------------------------------------- q142
  /** Ingestion novelty rate: per arrival bucket (doc_id order is the
    * synthetic ingest order), what fraction of documents carry a
    * fingerprint never seen in ANY earlier document — the curve every
    * continuously-crawling pipeline watches to decide when a source is
    * exhausted (novelty → 0 means you are re-crawling the same pages).
    * First-seen is `min(doc_id) over fingerprint` — dup-cluster-bounded
    * window partitions, never a stratum; the bucket rollup is a small
    * keyed aggregate over per-row flags.
    */
  val q142 = QuerySpec(
    "q142_ingest_novelty",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp")
      normalize(Tables.documents(s, d))
        .select(col("doc_id"), md5(col("text_norm")).as("fp"))
        .withColumn("first_id", min(col("doc_id")).over(w))
        .groupBy((col("doc_id") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("doc_id") === col("first_id"), lit(1))).as("n_novel"))
        .withColumn("novelty_rate",
          ffloor(col("n_novel").cast("double") / col("n_docs"), 4))
        .orderBy("bucket")
    },
    Some(s"""WITH fp AS (
              SELECT doc_id, md5(regexp_replace(${asciiLowerSql("text")},
                '$WhitespaceClass', ' ', 'g')) AS fp
              FROM documents),
            fl AS (
              SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS first_id
              FROM fp)
            SELECT CAST(doc_id // 50 AS BIGINT) AS bucket, COUNT(*) AS n_docs,
              COUNT(CASE WHEN doc_id = first_id THEN 1 END) AS n_novel,
              CAST(FLOOR(CAST(COUNT(CASE WHEN doc_id = first_id THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS novelty_rate
            FROM fl GROUP BY 1 ORDER BY 1""")
  )

  // --------------------------------------------------------------- q145
  /** Curation funnel: per source, how many documents survive each
    * successive quality gate — length band, stopword ratio, lexical
    * diversity, exact-dup — the loss-accounting table every data-curation
    * report leads with (where does my corpus go?). One scan computes all
    * per-row flags; the cumulative-AND counts are conditional aggregates;
    * the only window is the dup-cluster-bounded first-seen.
    */
  val q145 = QuerySpec(
    "q145_curation_funnel",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      val ts = split(col("text_norm"), " ")
      val nTok = size(ts)
      val stopR = size(filter(ts, t => t.isin("the", "a"))).cast("double") / nTok
      val divR = size(array_distinct(ts)).cast("double") / nTok
      val flags = normalize(Tables.documents(s, d))
        .withColumn("fp", md5(col("text_norm")))
        .withColumn("first_id", min(col("doc_id")).over(w))
        .select(col("source"),
          nTok.between(20, 1000).as("g1"),
          (stopR < 0.5).as("g2"),
          (divR > 0.3).as("g3"),
          (col("doc_id") === col("first_id")).as("g4"))
      flags.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("g1"), lit(1))).as("pass_len"),
          count(when(col("g1") && col("g2"), lit(1))).as("pass_stop"),
          count(when(col("g1") && col("g2") && col("g3"), lit(1))).as("pass_div"),
          count(when(col("g1") && col("g2") && col("g3") && col("g4"), lit(1)))
            .as("pass_dedup"))
        .withColumn("survival_rate",
          ffloor(col("pass_dedup").cast("double") / col("n_docs"), 4))
        .orderBy("source")
    },
    Some(s"""WITH base AS (
              SELECT source, doc_id,
                regexp_replace(${asciiLowerSql("text")}, '$WhitespaceClass', ' ', 'g') AS tn
              FROM documents),
            flags AS (
              SELECT source,
                len(string_split(tn, ' ')) BETWEEN 20 AND 1000 AS g1,
                CAST(len(list_filter(string_split(tn, ' '),
                    t -> t IN ('the', 'a'))) AS DOUBLE)
                  / len(string_split(tn, ' ')) < 0.5 AS g2,
                CAST(len(list_distinct(string_split(tn, ' '))) AS DOUBLE)
                  / len(string_split(tn, ' ')) > 0.3 AS g3,
                doc_id = MIN(doc_id) OVER (PARTITION BY md5(tn)) AS g4
              FROM base)
            SELECT source, COUNT(*) AS n_docs,
              COUNT(CASE WHEN g1 THEN 1 END) AS pass_len,
              COUNT(CASE WHEN g1 AND g2 THEN 1 END) AS pass_stop,
              COUNT(CASE WHEN g1 AND g2 AND g3 THEN 1 END) AS pass_div,
              COUNT(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 END) AS pass_dedup,
              CAST(FLOOR(CAST(COUNT(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS survival_rate
            FROM flags GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q146
  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws a deterministic uniform u from its salted hash and
    * ranks by ln(u)/w — the top-k by that key IS an exact weight-
    * proportional sample without replacement ("sample documents
    * proportional to length/quality" — the importance-sampling selector
    * DSIR-style mixing needs). No RNG state, no sequential reservoir:
    * the key is a pure per-row expression and top-200 compiles to
    * TakeOrderedAndProject (per-partition heaps), so the operator is one
    * narrow scan at any corpus size. Selection compares the TRUNCATED
    * key (both engines sort the identical ffloor'd double, doc_id
    * tiebreak), so the picked set is hash-stable cross-engine.
    */
  val q146 = QuerySpec(
    "q146_weighted_sample",
    (s, d) => {
      val u32 = conv(hashFrac(col("doc_id"), "aes"), 16, 10).cast("double")
      val u = (u32 + lit(1.0)) / lit(4294967296.0)
      val key = ffloor(log(u) / col("n_chars").cast("double"), 6)
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("source"), col("n_chars"), key.as("key6"))
        .orderBy(col("key6").desc, col("doc_id"))
        .limit(200)
    },
    Some("""WITH keyed AS (
              SELECT doc_id, source, n_chars,
                CAST(FLOOR(
                  ln((list_reduce(list_transform(range(1, 9),
                      i -> CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR) || ':aes'), i, 1)) - 1 AS DOUBLE)),
                      (a, b) -> a * 16.0 + b) + 1.0) / 4294967296.0)
                  / CAST(n_chars AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0 AS key6
              FROM documents WHERE n_chars > 0)
            SELECT doc_id, source, n_chars, key6 FROM keyed
            ORDER BY key6 DESC, doc_id LIMIT 200""")
  )

  // --------------------------------------------------------------- q148
  /** Persisted inverted-index statistics for BM25 — the store twin of
    * q107 (the NBModelStore/DecontamStore/ClusterStore idiom applied to
    * retrieval): `build` lands per-term document frequencies + corpus
    * moments (n_docs, total len — exact longs) once; every later batch
    * scores its OWN term frequencies against the broadcast store stats,
    * never rescanning the landed corpus. This is how a continuously-
    * ingesting retrieval pipeline keeps BM25 current: the store is the
    * index, batches pay O(batch). Scoring follows q107's micro-int
    * contract exactly, so the whole thing stays DuckDB-oracle-able (the
    * oracle recomputes the store split's stats in SQL).
    */
  object IdfStore {
    /** (term → df) + one-row meta (n_docs, sum_len). Vocab-bounded. */
    def build(docs: DataFrame, dir: String): Unit = {
      // two writers consume tf — materialize the tokenize pass once
      val tf = graft.core.Materialize(PretrainOps.termFreq(docs))
      tf.groupBy("term").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$dir/df.parquet")
      tf.groupBy("doc_id").agg(sum("tf").cast("long").as("len"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("len").cast("long").as("sum_len"))
        .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    }

    /** BM25-score a batch's docs for `queryTerms` against the STORE's
      * statistics (store df/avgdl, batch tf/len). */
    def scoreBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                   batch: DataFrame, queryTerms: Seq[String], k: Int): DataFrame = {
      val meta = spark.read.parquet(s"$dir/meta.parquet").head
      val (nDocs, sumLen) = (meta.getLong(0), meta.getLong(1))
      val avgdl = sumLen.toDouble / nDocs
      val df = spark.read.parquet(s"$dir/df.parquet")
        .filter(col("term").isin(queryTerms: _*))
      // one tokenization pass feeds both the query-term slice and the
      // per-doc lengths (round 15; was two full termFreq computations)
      val tfAll = graft.core.Materialize(PretrainOps.termFreq(batch))
      val tf = tfAll
        .filter(col("term").isin(queryTerms: _*))
      val lens = tfAll
        .groupBy("doc_id").agg(sum("tf").cast("long").as("len"))
      val idfMicro = floor(log(
        (lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1e6)).cast("long")
      val sat = (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(1.0) - lit(0.75) + lit(0.75) * (col("len").cast("double") / lit(avgdl))))
      tf.join(broadcast(df), "term")
        .join(lens, "doc_id")
        .select(col("doc_id"), floor(idfMicro.cast("double") * sat).cast("long")
          .as("pair_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms_hit"),
          sum("pair_micro").cast("long").as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id"), col("n_terms_hit"), col("score_micro"),
          ffloor(col("score_micro").cast("double") / lit(1e6), 4).as("score"))
    }
  }

  /** One store build per (JVM, sf-dir) — q119's amortization idiom: the
    * query measures the per-batch scoring cost, not the index build. */
  private val idfBuilt = scala.collection.concurrent.TrieMap.empty[String, String]
  private def idfStoreDir(s: org.apache.spark.sql.SparkSession, d: String): String =
    idfBuilt.getOrElseUpdate(d, {
      val dir = graft.core.TempDirs.scratch("graft-idfstore-")
      IdfStore.build(Tables.documents(s, d).filter(col("doc_id") % 5 =!= 0), dir)
      dir
    })

  val q148 = QuerySpec(
    "q148_bm25_store",
    (s, d) => {
      val dir = idfStoreDir(s, d)
      IdfStore.scoreBatch(s, dir,
        Tables.documents(s, d).filter(col("doc_id") % 5 === 0),
        Seq("spark", "join", "merge"), k = 20)
    },
    Some(s"""WITH store_toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents WHERE doc_id % 5 <> 0),
            store_tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM store_toks
                         WHERE term <> '' GROUP BY 1, 2),
            store_lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
                           FROM store_tf GROUP BY 1),
            meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(len) AS BIGINT) AS sum_len FROM store_lens),
            qdf AS (SELECT term, COUNT(*) AS df FROM store_tf
                    WHERE term IN ('spark', 'join', 'merge') GROUP BY term),
            batch_toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents WHERE doc_id % 5 = 0),
            batch_tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM batch_toks
                         WHERE term <> '' GROUP BY 1, 2),
            batch_lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
                           FROM batch_tf GROUP BY 1),
            scored AS (
              SELECT tf.doc_id,
                CAST(FLOOR(
                  CAST(CAST(FLOOR(ln(
                    (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT) AS DOUBLE)
                  * ((CAST(tf AS DOUBLE) * 2.2)
                     / (CAST(tf AS DOUBLE) + 1.2
                        * (1.0 - 0.75 + 0.75 * (CAST(len AS DOUBLE)
                           / (CAST(sum_len AS DOUBLE) / n_docs)))))
                ) AS BIGINT) AS pair_micro
              FROM batch_tf tf
              JOIN qdf USING (term)
              JOIN batch_lens ON tf.doc_id = batch_lens.doc_id
              CROSS JOIN meta
              WHERE tf.term IN ('spark', 'join', 'merge'))
            SELECT doc_id, COUNT(*) AS n_terms_hit,
              CAST(SUM(pair_micro) AS BIGINT) AS score_micro,
              CAST(FLOOR(CAST(SUM(pair_micro) AS DOUBLE) / 1000000.0
                * 10000.0) AS DOUBLE) / 10000.0 AS score
            FROM scored GROUP BY doc_id
            ORDER BY score_micro DESC, doc_id LIMIT 20""")
  )

  // --------------------------------------------------------------- q149
  /** Sketch-vs-exact quantile audit: Spark's built-in `percentile_approx`
    * (Greenwald–Khanna, the one-pass mergeable sketch — the 100 TB
    * everyday path) audited in-query against q118's exact histogram-
    * refine engine. Rows-only by design (GK's internal compaction is not
    * ANSI-SQL-expressible); CorpusStatsSpec bounds rel_err, and the
    * query output carries the audit so any run exposes sketch drift.
    * This completes the exact↔approx pairing for order statistics the
    * way q27↔q30 pairs similarity.
    */
  val q149 = QuerySpec(
    "q149_approx_quantile_audit",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val exact = graft.operators.Quantiles.exactQuantiles(
        li, "l_extendedprice", Seq(50, 90, 99), refineThreshold = 4096)
        .select(col("pct"), col("value").as("exact_value"))
      val approx = li.agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("vs"))
        .select(posexplode(col("vs")))
        .select((element_at(array(lit(50), lit(90), lit(99)), col("pos") + 1))
          .as("pct"), col("col").as("approx_value"))
      exact.join(approx, "pct")
        .select(col("pct"), col("exact_value"), col("approx_value"),
          ffloor(abs(col("approx_value") - col("exact_value")) /
            col("exact_value"), 6).as("rel_err"))
        .orderBy("pct")
    },
    None
  )

  // --------------------------------------------------------------- q154
  /** Blocklist safety gate: per source, how many documents trip a term
    * blocklist (≥3 hits flags the doc) and what fraction of all tokens
    * are blocklisted — the first-line unsafe-content filter every corpus
    * release runs (wordlist gating precedes any model-based safety
    * scorer). Pure per-row array work (no explode — `filter` over the
    * token array), one per-source aggregate.
    */
  val q154 = QuerySpec(
    "q154_blocklist_gate",
    (s, d) => {
      val block = Seq("slow", "error", "big")
      val ts = split(asciiLower(col("text")), " ")
      val nTok = size(ts)
      val hits = size(filter(ts, t => t.isin(block: _*)))
      Tables.documents(s, d)
        .select(col("source"), nTok.as("n_tok"), hits.as("hits"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("hits") >= 3, lit(1))).as("n_flagged"),
          sum(col("hits")).cast("long").as("hit_tokens"),
          sum(col("n_tok")).cast("long").as("total_tokens"))
        .withColumn("flag_rate",
          ffloor(col("n_flagged").cast("double") / col("n_docs"), 4))
        .withColumn("hit_ratio",
          ffloor(col("hit_tokens").cast("double") / col("total_tokens"), 6))
        .orderBy("source")
    },
    Some(s"""WITH per AS (
              SELECT source,
                len(string_split(${asciiLowerSql("text")}, ' ')) AS n_tok,
                len(list_filter(string_split(${asciiLowerSql("text")}, ' '),
                  t -> t IN ('slow', 'error', 'big'))) AS hits
              FROM documents)
            SELECT source, COUNT(*) AS n_docs,
              COUNT(CASE WHEN hits >= 3 THEN 1 END) AS n_flagged,
              CAST(SUM(hits) AS BIGINT) AS hit_tokens,
              CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
              CAST(FLOOR(CAST(COUNT(CASE WHEN hits >= 3 THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS flag_rate,
              CAST(FLOOR(CAST(SUM(hits) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS hit_ratio
            FROM per GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q155
  /** Percentile-normalization WITHOUT a global sort — the pattern that
    * replaces `percent_rank() OVER ()` (a corpus-wide single-task window,
    * forbidden at scale): exact decile BOUNDARIES come from the q118
    * histogram-refine engine (narrow passes, driver gets 9 values), are
    * broadcast as literals, and every row buckets itself with 9
    * comparisons. Here the pattern normalizes document length into
    * deciles and cross-tabs it against a quality signal (stopword
    * ratio ≥ 0.4) — the "is low quality concentrated in short docs"
    * diagnostic. The oracle recomputes the same rank-convention
    * boundaries (k = ⌈p·n/100⌉, q118's integer form) via row_number.
    */
  val q155 = QuerySpec(
    "q155_decile_normalize",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bounds = graft.operators.Quantiles.exactQuantiles(
          docs, "n_chars", (10 to 90 by 10), refineThreshold = 4096)
        .select("value").collect().map(_.getLong(0)).sorted
      val decile = bounds.map(v => (col("n_chars") > v).cast("int"))
        .reduce(_ + _) + lit(1)
      val ts = split(asciiLower(col("text")), " ")
      val stopR = size(filter(ts, t => t.isin("the", "a"))).cast("double") / size(ts)
      docs
        .select(decile.as("len_decile"),
          (stopR >= 0.4).as("stoppy"), col("n_chars"))
        .groupBy("len_decile")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("stoppy"), lit(1))).as("n_stoppy"),
          ffloor(sum(col("n_chars")).cast("double") / count(lit(1)), 2)
            .as("avg_chars"))
        .withColumn("stoppy_rate",
          ffloor(col("n_stoppy").cast("double") / col("n_docs"), 4))
        .orderBy("len_decile")
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n FROM documents),
            ranked AS (
              SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn
              FROM documents),
            bounds AS (
              SELECT rn, n_chars AS b FROM ranked, n
              WHERE rn IN (SELECT CAST((p * n + 99) // 100 AS BIGINT)
                           FROM (SELECT unnest([10,20,30,40,50,60,70,80,90]) AS p), n)),
            per AS (
              SELECT d.n_chars,
                1 + (SELECT COUNT(*) FROM bounds WHERE d.n_chars > b) AS len_decile,
                CAST(len(list_filter(string_split(${asciiLowerSql("text")}, ' '),
                    t -> t IN ('the', 'a'))) AS DOUBLE)
                  / len(string_split(${asciiLowerSql("text")}, ' ')) >= 0.4 AS stoppy
              FROM documents d)
            SELECT len_decile, COUNT(*) AS n_docs,
              COUNT(CASE WHEN stoppy THEN 1 END) AS n_stoppy,
              CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 100.0) AS DOUBLE)
                / 100.0 AS avg_chars,
              CAST(FLOOR(CAST(COUNT(CASE WHEN stoppy THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS stoppy_rate
            FROM per GROUP BY len_decile ORDER BY len_decile""")
  )

  // --------------------------------------------------------------- q158
  /** Deduplicated token inventory: per source, the raw token count vs
    * the EFFECTIVE count after exact dedup (tokens attributed only to
    * each fingerprint's first occurrence) — the number a token-budget
    * planner (q86) should actually be fed; raw counts overstate a
    * dup-heavy source's contribution. One fingerprint window
    * (dup-cluster-bounded) + one per-source aggregate.
    */
  val q158 = QuerySpec(
    "q158_dedup_token_budget",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      val nTok = size(split(col("text_norm"), " "))
      normalize(Tables.documents(s, d))
        .withColumn("fp", md5(col("text_norm")))
        .withColumn("canon", col("doc_id") ===
          min(col("doc_id")).over(w))
        .select(col("source"), nTok.as("n_tok"), col("canon"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("raw_tokens"),
          sum(when(col("canon"), col("n_tok")).otherwise(lit(0)))
            .cast("long").as("effective_tokens"))
        .withColumn("dup_token_frac",
          ffloor((col("raw_tokens") - col("effective_tokens")).cast("double") /
            col("raw_tokens"), 4))
        .orderBy("source")
    },
    Some(s"""WITH per AS (
              SELECT source, doc_id,
                regexp_replace(${asciiLowerSql("text")}, '$WhitespaceClass', ' ', 'g') AS tn
              FROM documents),
            fl AS (
              SELECT source, len(string_split(tn, ' ')) AS n_tok,
                doc_id = MIN(doc_id) OVER (PARTITION BY md5(tn)) AS canon
              FROM per)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
              CAST(SUM(CASE WHEN canon THEN n_tok ELSE 0 END) AS BIGINT)
                AS effective_tokens,
              CAST(FLOOR(CAST(SUM(n_tok) - SUM(CASE WHEN canon THEN n_tok ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) * 10000.0) AS DOUBLE)
                / 10000.0 AS dup_token_frac
            FROM fl GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q159
  /** Decontaminated eval split: draw a ~20% test split by salted hash
    * (q79's leakage-free membership), then EXCLUDE from it any document
    * sharing an 8-gram with any train document — the standard "eval set
    * must not overlap train" guarantee (q58's decontamination applied
    * between a corpus's own splits). The gram overlap is one
    * distinct-gram equi-join (train side deduped per gram before the
    * shuffle); per-source loss accounting comes out the other end.
    */
  val q159 = QuerySpec(
    "q159_decontaminated_split",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isTest = hashFrac(col("doc_id"), "evalsplit") < "33333333" // ~20%
      val test = docs.filter(isTest)
      val train = docs.filter(!isTest)
      val testGrams = Dedup.shingles(test, 8)
      val trainGrams = Dedup.shingles(train, 8).select("shingle").distinct()
      val leaky = testGrams.join(trainGrams, "shingle")
        .select("doc_id").distinct()
      test.join(leaky.withColumn("leak", lit(true)), Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_test"),
          count(when(col("leak"), lit(1))).as("n_leaky"))
        .withColumn("n_clean", col("n_test") - col("n_leaky"))
        .orderBy("source")
    },
    Some(s"""WITH tagged AS (
              SELECT doc_id, source,
                string_split(${asciiLowerSql("text")}, ' ') AS ts,
                substr(md5(CAST(doc_id AS VARCHAR) || ':evalsplit'), 1, 8)
                  < '33333333' AS is_test
              FROM documents),
            tg AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 6),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                      || '_' || ts[i+4] || '_' || ts[i+5] || '_' || ts[i+6] || '_' || ts[i+7])) AS g
                FROM tagged WHERE is_test AND len(ts) >= 8)),
            trg AS (
              SELECT DISTINCT g FROM (
                SELECT unnest(list_transform(range(1, len(ts) - 6),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                      || '_' || ts[i+4] || '_' || ts[i+5] || '_' || ts[i+6] || '_' || ts[i+7])) AS g
                FROM tagged WHERE NOT is_test AND len(ts) >= 8)),
            leaky AS (SELECT DISTINCT doc_id FROM tg WHERE g IN (SELECT g FROM trg))
            SELECT source, COUNT(*) AS n_test,
              COUNT(CASE WHEN EXISTS (SELECT 1 FROM leaky WHERE leaky.doc_id = t.doc_id)
                THEN 1 END) AS n_leaky,
              COUNT(*) - COUNT(CASE WHEN EXISTS (SELECT 1 FROM leaky
                WHERE leaky.doc_id = t.doc_id) THEN 1 END) AS n_clean
            FROM tagged t WHERE is_test
            GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q160
  /** Source signature terms: top-5 tokens per source by TF-IDF — the
    * "what is this source actually about" profile (and the features a
    * source classifier starts from). IDF follows q55's micro-nat
    * contract (ln behind an integer floor), the score is an exact
    * long product, and the per-source top-5 is a rank window over the
    * (source, term) aggregate — partitions are source-vocab-bounded,
    * never corpus-bounded.
    */
  val q160 = QuerySpec(
    "q160_source_signature_terms",
    (s, d) => {
      val tf = normalize(Tables.documents(s, d))
        .select(col("source"), explode(split(col("text_norm"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("source", "tok").agg(count(lit(1)).as("tf"))
      val sdf = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val nSrc = tf.select("source").distinct()
        .agg(count(lit(1)).as("n_src"))
      val idfMicro = floor(log((col("n_src").cast("double") + lit(1.0)) /
        (col("df").cast("double") + lit(1.0))) * lit(1e6)).cast("long")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(col("score_micro").desc, col("tok"))
      tf.join(sdf, "tok").crossJoin(broadcast(nSrc))
        .select(col("source"), col("tok"),
          (col("tf") * idfMicro).as("score_micro"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("tok"), col("score_micro"))
        .orderBy("source", "rk")
    },
    Some(s"""WITH tf AS (
              SELECT source, t.tok, COUNT(*) AS tf
              FROM documents,
                UNNEST(string_split(regexp_replace(${asciiLowerSql("text")},
                  '$WhitespaceClass', ' ', 'g'), ' ')) AS t(tok)
              WHERE length(t.tok) > 0
              GROUP BY 1, 2),
            sdf AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
            ns AS (SELECT COUNT(DISTINCT source) AS n_src FROM tf),
            scored AS (
              SELECT source, tok,
                tf * CAST(FLOOR(ln((CAST(n_src AS DOUBLE) + 1.0)
                  / (CAST(df AS DOUBLE) + 1.0)) * 1000000.0) AS BIGINT)
                  AS score_micro
              FROM tf JOIN sdf USING (tok) CROSS JOIN ns)
            SELECT source, rk, tok, score_micro FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY score_micro DESC, tok) AS rk
              FROM scored)
            WHERE rk <= 5 ORDER BY source, rk""")
  )

  // --------------------------------------------------------------- q162
  /** PageRank-lite centrality over the near-dup candidate graph (5 fixed
    * power iterations, damping 0.85) — "which document is the HUB of its
    * duplication neighborhood" (a centrality-aware alternative to q72's
    * longest-wins canonical pick: the most-connected member is often the
    * original, mirrors link to it). All arithmetic is integer micro-units
    * with explicit `div` at every step — per-edge contribution
    * r div deg, update 0.15 + 0.85·Σ as (Σ·85) div 100 — so five rounds
    * of long math are bit-identical cross-engine and the DuckDB oracle is
    * the same five rounds unrolled over q101's edge CTE. Per round: one
    * keyed join of the endpoint-rank table + one map-side-combined sum —
    * q101's fixpoint shape with a fixed round count.
    */
  val q162 = QuerySpec(
    "q162_pagerank_lite",
    (s, d) => {
      // deg never changes across rounds, so edges ⋈ deg is HOISTED and
      // Materialized once — each round then costs ONE keyed join + one
      // map-side-combined sum, not two joins (measured: the in-loop
      // edges⋈deg re-join was half of each round's work).
      val ed = graft.core.Materialize {
        val edges = Dedup.neardupEdges(Tables.documents(s, d))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        edges.join(deg, "src")
      }
      var ranks = ed.select(col("src").as("id")).distinct()
        .withColumn("r", lit(1000000L))
      for (round <- 1 to 5) {
        // Lineage cut every SECOND round (neardupLabels' measured knee:
        // a cut per round pays the fixed checkpoint cost 5× for rank
        // tables of a few thousand rows; a cut every other round caps
        // the un-reused plan depth at two joins while halving that
        // cost — the re-optimization blowup needs ~5+ stacked rounds).
        val next = ed.join(ranks, col("src") === col("id"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(cs * 85) div 100")).as("r"))
        ranks = if (round % 2 == 0) graft.core.Materialize(next) else next
      }
      ranks.select(col("id").as("doc_id"), col("r").as("rank_micro"))
        .orderBy("doc_id")
    },
    Some {
      val rounds = (1 to 5).map { i =>
        s"""r$i AS (
              SELECT e.dst AS id,
                150000 + (SUM(p.r // d.deg) * 85) // 100 AS r
              FROM edges e
              JOIN deg d ON e.src = d.src
              JOIN r${i - 1} p ON p.id = e.src
              GROUP BY e.dst)"""
      }.mkString(",\n            ")
      s"""WITH ${Dedup.neardupEdgesCtes},
            deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
            r0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS r
                   FROM edges),
            $rounds
            SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_micro
            FROM r5 ORDER BY doc_id"""
    }
  )

  // --------------------------------------------------------------- q165
  /** Reciprocal-rank fusion of two lexical rankings — the standard
    * hybrid-search combiner (fuse BM25 with anything; here BM25's
    * saturation-weighted ranking vs raw tf·idf, which order documents
    * DIFFERENTLY). RRF score = Σ 1/(60+rank) over the rankings,
    * computed as floor(1e9/(60+rank)) longs so the fused ordering is
    * integer-exact. Both rankings operate on the query-matched subset
    * only (docs containing a query term — query-bounded, not
    * corpus-bounded, so the rank windows are safe at scale), and the
    * fused top-10 is one more TakeOrdered.
    */
  val q165 = QuerySpec(
    "q165_rank_fusion",
    (s, d) => {
      val terms = Seq("spark", "join", "merge")
      val docs = Tables.documents(s, d)
      // One tokenization pass: Materialize termFreq once and derive both the
      // query-term TF slice and per-doc lengths from it (two corpus passes
      // would double the dominant cost at 100 TB).
      val all = graft.core.Materialize(PretrainOps.termFreq(docs))
      val tf = all.filter(col("term").isin(terms: _*))
      val lens = all
        .groupBy("doc_id").agg(sum("tf").cast("long").as("len"))
      val nAvg = lens.agg(count(lit(1)).cast("long").as("n_docs"),
        (sum("len").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idfMicro = floor(log(
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1e6)).cast("long")
      val base = tf.join(broadcast(df), "term").join(lens, "doc_id")
        .crossJoin(broadcast(nAvg))
        .select(col("doc_id"), col("term"), col("tf"), col("len"), col("avgdl"),
          idfMicro.as("idf_micro"))
      val sat = (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(1.0) - lit(0.75) + lit(0.75) * (col("len").cast("double") / col("avgdl"))))
      val bm25 = base
        .select(col("doc_id"),
          floor(col("idf_micro").cast("double") * sat).cast("long").as("pm"))
        .groupBy("doc_id").agg(sum("pm").cast("long").as("s"))
      val tfidf = base
        .select(col("doc_id"), (col("tf") * col("idf_micro")).as("pm"))
        .groupBy("doc_id").agg(sum("pm").cast("long").as("s"))
      def ranked(r: DataFrame): DataFrame = r.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("s").desc, col("doc_id"))))
        .select(col("doc_id"), expr("1000000000 div (60 + rk)").as("rrf"))
      ranked(bm25).unionAll(ranked(tfidf))
        .groupBy("doc_id").agg(sum(col("rrf")).cast("long").as("rrf_score"),
          count(lit(1)).as("n_rankings"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tfall AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
                      WHERE term <> '' GROUP BY 1, 2),
            tf AS (SELECT * FROM tfall WHERE term IN ('spark', 'join', 'merge')),
            lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tfall GROUP BY 1),
            navg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
                     FROM lens),
            qdf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            base AS (
              SELECT tf.doc_id, tf.term, tf.tf, len, avgdl,
                CAST(FLOOR(ln(
                  (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT)
                  AS idf_micro
              FROM tf JOIN qdf USING (term) JOIN lens ON tf.doc_id = lens.doc_id
              CROSS JOIN navg),
            bm25 AS (
              SELECT doc_id, CAST(SUM(CAST(FLOOR(
                CAST(idf_micro AS DOUBLE)
                * ((CAST(tf AS DOUBLE) * 2.2)
                   / (CAST(tf AS DOUBLE) + 1.2
                      * (1.0 - 0.75 + 0.75 * (CAST(len AS DOUBLE) / avgdl))))
                ) AS BIGINT)) AS BIGINT) AS s
              FROM base GROUP BY doc_id),
            tfidf AS (
              SELECT doc_id, CAST(SUM(tf * idf_micro) AS BIGINT) AS s
              FROM base GROUP BY doc_id),
            ra AS (SELECT doc_id,
                     1000000000 // (60 + ROW_NUMBER() OVER (ORDER BY s DESC, doc_id))
                       AS rrf
                   FROM bm25),
            rb AS (SELECT doc_id,
                     1000000000 // (60 + ROW_NUMBER() OVER (ORDER BY s DESC, doc_id))
                       AS rrf
                   FROM tfidf),
            u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb)
            SELECT doc_id, CAST(SUM(rrf) AS BIGINT) AS rrf_score,
              COUNT(*) AS n_rankings
            FROM u GROUP BY doc_id
            ORDER BY rrf_score DESC, doc_id LIMIT 10""")
  )

  // --------------------------------------------------------------- q166
  /** Exact two-sample Kolmogorov–Smirnov distance between the first two
    * sources' document-length distributions — the "are these sources
    * drawn from the same distribution" test (complements q110's PSI,
    * which needs binning; KS is binning-free). Exactness: ECDFs are
    * compared on the VALUE domain via cumulative counts, and the sup is
    * taken over |cum_a·n_b − cum_b·n_a| — pure long arithmetic, the
    * fractional ECDFs multiplied away (q164's trick). The cumulative
    * window runs over distinct values of the pooled pair (bounded by the
    * value domain, not corpus size).
    */
  val q166 = QuerySpec(
    "q166_ks_distance",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1"))
      val byVal = docs.groupBy(col("n_chars").as("v"))
        .agg(count(when(col("source") === "src0", lit(1))).as("ca"),
          count(when(col("source") === "src1", lit(1))).as("cb"))
      val tot = docs.agg(
        count(when(col("source") === "src0", lit(1))).as("na"),
        count(when(col("source") === "src1", lit(1))).as("nb"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      byVal.crossJoin(broadcast(tot))
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cb")).over(w))
        .withColumn("dev", abs(col("cuma") * col("nb") - col("cumb") * col("na")))
        .agg(max(col("dev")).as("max_dev"), first(col("na")).as("na"),
          first(col("nb")).as("nb"))
        .select(col("na"), col("nb"),
          ffloor(col("max_dev").cast("double") /
            (col("na") * col("nb")).cast("double"), 6).as("ks_distance"))
    },
    Some("""WITH docs AS (
              SELECT source, n_chars FROM documents WHERE source IN ('src0', 'src1')),
            by_val AS (
              SELECT n_chars AS v,
                COUNT(CASE WHEN source = 'src0' THEN 1 END) AS ca,
                COUNT(CASE WHEN source = 'src1' THEN 1 END) AS cb
              FROM docs GROUP BY 1),
            tot AS (
              SELECT COUNT(CASE WHEN source = 'src0' THEN 1 END) AS na,
                COUNT(CASE WHEN source = 'src1' THEN 1 END) AS nb
              FROM docs),
            cum AS (
              SELECT v, na, nb,
                SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
              FROM by_val CROSS JOIN tot
              WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
              CAST(FLOOR(CAST(MAX(abs(cuma * nb - cumb * na)) AS DOUBLE)
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS ks_distance
            FROM cum GROUP BY na, nb""")
  )

  // --------------------------------------------------------------- q167
  /** Gini coefficient of token-frequency concentration per source — the
    * lexical-diversity inequality measure (near 0 = uniform vocabulary
    * use; near 1 = a few tokens dominate, i.e. template spam; pairs with
    * q137's entropy as the second diagnostic axis). For sorted counts
    * x_1≤…≤x_n: G = (2·Σ i·x_i)/(n·Σx) − (n+1)/n. The rank window
    * partitions by source and orders the source's VOCABULARY (vocab-
    * bounded, never corpus-bounded); Σ i·x_i and Σx are exact longs and
    * the final formula is one fixed-IEEE expression over them.
    */
  val q167 = QuerySpec(
    "q167_token_gini",
    (s, d) => {
      val cnts = normalize(Tables.documents(s, d))
        .select(col("source"), explode(split(col("text_norm"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("cnt"), col("tok"))
      cnts.withColumn("i", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_vocab"),
          sum(col("cnt")).cast("long").as("total"),
          sum(col("i") * col("cnt")).cast("long").as("iwx"))
        .select(col("source"), col("n_vocab"), col("total"),
          ffloor(
            (lit(2.0) * col("iwx").cast("double")) /
              (col("n_vocab").cast("double") * col("total").cast("double")) -
              (col("n_vocab") + lit(1)).cast("double") / col("n_vocab").cast("double"),
            6).as("gini"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
              SELECT source, t.tok FROM documents,
                UNNEST(string_split(regexp_replace(${asciiLowerSql("text")},
                  '$WhitespaceClass', ' ', 'g'), ' ')) AS t(tok)
              WHERE length(t.tok) > 0),
            cnts AS (SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
            ranked AS (
              SELECT source, cnt,
                ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt, tok) AS i
              FROM cnts)
            SELECT source, COUNT(*) AS n_vocab,
              CAST(SUM(cnt) AS BIGINT) AS total,
              CAST(FLOOR(
                ((2.0 * CAST(SUM(i * cnt) AS DOUBLE))
                  / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
                 - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                * 1000000.0) AS DOUBLE) / 1000000.0 AS gini
            FROM ranked GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q179
  /** Positional PHRASE search — exact consecutive-token phrase matching,
    * the inverted-index capability BM25 (q107/q148) cannot express: bag-
    * of-words scoring finds documents containing {slow, hash, batch};
    * only positional postings find "slow hash batch" in that order. The
    * plan is the one-shuffle positional-postings join: each occurrence of
    * a phrase word emits (doc_id, anchor = pos − word's phrase offset),
    * and a position where ALL |phrase| distinct offsets land on the same
    * anchor is a match — ONE explode pass, one keyed aggregate on
    * (doc_id, anchor), no pairwise self-join and no fan-out (phrase
    * words must be distinct; repeated-word phrases would emit one
    * anchor row per matching offset).
    *
    * Scale shape: the token filter keeps only the ≤3 phrase words' rows
    * (the postings a real index would fetch), so the shuffle carries the
    * phrase words' posting volume, not the corpus. Everything after the
    * explode is integer arithmetic — hash-exact.
    */
  val q179 = QuerySpec(
    "q179_phrase_search",
    (s, d) => {
      val phrase = Seq("slow", "hash", "batch") // distinct words, see Scaladoc
      val off = phrase.zipWithIndex.tail.foldLeft(
        when(col("tok") === phrase.head, 0)) {
        case (acc, (wd, i)) => acc.when(col("tok") === wd, i)
      }
      Dedup.tokensWithPos(Tables.documents(s, d))
        .filter(col("tok").isin(phrase: _*))
        .select(col("doc_id"), (col("pos") - off).as("anchor"), off.as("idx"))
        .groupBy("doc_id", "anchor")
        .agg(countDistinct(col("idx")).as("k"))
        .filter(col("k") === phrase.size)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_matches"),
          min(col("anchor")).cast("long").as("first_pos"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents),
            tp AS (
              SELECT doc_id, i - 1 AS pos, ts[i] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
                    FROM toks)),
            hits AS (
              SELECT doc_id,
                pos - CASE tok WHEN 'slow' THEN 0 WHEN 'hash' THEN 1
                      ELSE 2 END AS anchor,
                CASE tok WHEN 'slow' THEN 0 WHEN 'hash' THEN 1
                      ELSE 2 END AS idx
              FROM tp WHERE tok IN ('slow', 'hash', 'batch')),
            m AS (
              SELECT doc_id, anchor FROM hits
              GROUP BY doc_id, anchor HAVING COUNT(DISTINCT idx) = 3)
            SELECT doc_id, COUNT(*) AS n_matches,
              CAST(MIN(anchor) AS BIGINT) AS first_pos
            FROM m GROUP BY doc_id ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q228
  /** EXACT 1-D WASSERSTEIN (earth-mover) drift per source — the integral
    * companion to [[q166]]'s KS sup-distance: W₁ = ∫|F_s − F_g| dx feels
    * HOW FAR the mass moved, not just the single worst CDF gap, which is
    * what a mixture rebalance actually costs (KS flags a sharp local
    * spike and a wholesale length shift identically; W₁ separates them).
    * Over the integer n_chars domain the integral is a finite sum:
    * Σ_v |cum_s(v)·N − cum_g(v)·n_s| · gap(v), with the fractional CDFs
    * cross-multiplied away (q166's trick) so everything up to the final
    * division is exact DECIMAL(38,0)/HUGEINT.
    *
    * Scale shape: one corpus aggregate to the (source, value) cell table;
    * the global value spine (with its gap and cumulative count) is a
    * value-domain-bounded window; the per-source CDF is a window over the
    * sources × values grid (G·V rows — the q217 grid shape). The corpus
    * is scanned once.
    */
  val q228 = QuerySpec(
    "q228_w1_drift",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // one corpus pass: the (source, value) cell table is the only
      // corpus-grain aggregate; spine/margins/total all derive from it
      // (q206/q209's multiply-consumed-subtree discipline)
      val cells = graft.core.Materialize(
        docs.groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c_sv")))
      val wv = org.apache.spark.sql.expressions.Window.orderBy("v")
      val spine = cells.groupBy("v")
        .agg(sum("c_sv").cast("long").as("c_v"))
        .withColumn("cum_g", sum("c_v").over(
          wv.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("gap", coalesce(lead("v", 1).over(wv) - col("v"), lit(0L)))
      val srcs = cells.groupBy("source").agg(sum("c_sv").cast("long").as("n_s"))
      val total = cells.agg(sum("c_sv").cast("long").as("n"))
      val ws = org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      srcs.crossJoin(broadcast(spine))
        .join(cells, Seq("source", "v"), "left")
        .na.fill(0L, Seq("c_sv"))
        .crossJoin(broadcast(total))
        .withColumn("cum_s", sum("c_sv").over(ws))
        .withColumn("contrib",
          abs(col("cum_s").cast(DecimalType(38, 0)) * col("n") -
            col("cum_g").cast(DecimalType(38, 0)) * col("n_s")) * col("gap"))
        .groupBy("source")
        .agg(max("n_s").cast("long").as("n_docs"),
          sum("contrib").cast(DecimalType(38, 0)).as("num"),
          (max("n_s").cast(DecimalType(38, 0)) * max("n"))
            .cast(DecimalType(38, 0)).as("den"))
        .select(col("source"), col("n_docs"),
          ffloor(col("num").cast("double") / col("den").cast("double"), 6)
            .as("w1_chars"))
        .orderBy("source")
    },
    Some("""WITH cells AS (
              SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c_sv
              FROM documents GROUP BY 1, 2),
            spine AS (
              SELECT v, cum_g,
                COALESCE(LEAD(v, 1) OVER (ORDER BY v) - v, 0) AS gap
              FROM (
                SELECT n_chars AS v,
                  CAST(SUM(COUNT(*)) OVER (ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS cum_g
                FROM documents GROUP BY n_chars)),
            srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
                     FROM documents GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
            grid AS (
              SELECT s.source, s.n_s, p.v, p.cum_g, p.gap, t.n,
                COALESCE(c.c_sv, 0) AS c_sv
              FROM srcs s CROSS JOIN spine p CROSS JOIN tot t
              LEFT JOIN cells c ON c.source = s.source AND c.v = p.v),
            cdf AS (
              SELECT source, n_s, n, cum_g, gap,
                CAST(SUM(c_sv) OVER (PARTITION BY source ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_s
              FROM grid),
            agg AS (
              SELECT source, MAX(n_s) AS n_docs,
                CAST(SUM(ABS(CAST(cum_s AS HUGEINT) * n
                  - CAST(cum_g AS HUGEINT) * n_s) * gap) AS HUGEINT) AS num,
                CAST(MAX(n_s) AS HUGEINT) * MAX(n) AS den
              FROM cdf GROUP BY 1)
            SELECT source, n_docs,
              CAST(FLOOR(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS w1_chars
            FROM agg ORDER BY source""")
  )

  val all: Seq[QuerySpec] = Seq(q136, q137, q140, q142, q145, q146, q148,
    q149, q154, q155, q158, q159, q160, q162, q165, q166, q167, q179, q228)
}
