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

  // --------------------------------------------------------------- q139
  /** Candidate-quality audit: precision/recall of the 3-gram
    * Jaccard ≥ 0.5 candidate rule against exact-duplicate ground truth —
    * the measurement that justifies (or indicts) a near-dup threshold
    * before a multi-PB dedup run. Truth pairs are NEVER materialized:
    * the truth count is Σ m·(m−1)/2 over fingerprint-group sizes (one
    * aggregate), and hits are candidate pairs (already bounded by the
    * capped-shingle join) whose two fingerprints match — two keyed joins
    * of the SMALL candidate set against the per-doc fingerprint table.
    */
  val q139 = QuerySpec(
    "q139_jaccard_candidate_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = normalize(docs).select(col("doc_id"), md5(col("text_norm")).as("fp"))
      // q27's capped-shingle candidate join (same plan, same cap).
      val bg = graft.core.Materialize(graft.operators.Ops.capKeyFreq(
        Dedup.shingles(docs, 3), Dedup.MaxShingleDocFreq, col("shingle")))
      val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
      val jac = ffloor(
        col("inter").cast("double") / (col("s1.nbg") + col("s2.nbg") - col("inter")), 4)
      val cand = bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.as("s1")), col("d1") === col("s1.doc_id"))
        .join(broadcast(sizes.as("s2")), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      val nTruth = fp.groupBy("fp").agg(count(lit(1)).as("m"))
        .agg(sum(col("m") * (col("m") - 1) / 2).cast("long").as("n_truth"))
      val hits = cand
        .join(fp.select(col("doc_id").as("d1"), col("fp").as("f1")), "d1")
        .join(fp.select(col("doc_id").as("d2"), col("fp").as("f2")), "d2")
        .agg(count(lit(1)).as("n_cand"),
          count(when(col("f1") === col("f2"), lit(1))).as("n_hit"))
      hits.crossJoin(nTruth)
        .select(col("n_cand"), col("n_truth"), col("n_hit"),
          ffloor(col("n_hit").cast("double") / nullif(col("n_cand"), lit(0L)), 6)
            .as("precision"),
          ffloor(col("n_hit").cast("double") / nullif(col("n_truth"), lit(0L)), 6)
            .as("recall"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 3),
            trigrams_all AS (
              SELECT DISTINCT doc_id, bg FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2])) AS bg
                FROM toks)),
            trigrams AS (
              SELECT doc_id, bg FROM trigrams_all
              QUALIFY COUNT(*) OVER (PARTITION BY bg) <= 1000),
            sizes AS (SELECT doc_id, COUNT(*) AS nbg FROM trigrams GROUP BY doc_id),
            cand AS (
              SELECT d1, d2 FROM (
                SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
                FROM trigrams a JOIN trigrams b
                  ON a.bg = b.bg AND a.doc_id < b.doc_id
                GROUP BY 1, 2) p
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id
              WHERE CAST(FLOOR(CAST(inter AS DOUBLE) / (s1.nbg + s2.nbg - inter)
                * 10000.0) AS DOUBLE) / 10000.0 >= 0.5),
            fp AS (
              SELECT doc_id, md5(regexp_replace(${asciiLowerSql("text")},
                '$WhitespaceClass', ' ', 'g')) AS fp
              FROM documents),
            truth AS (
              SELECT CAST(SUM(m * (m - 1) / 2) AS BIGINT) AS n_truth
              FROM (SELECT COUNT(*) AS m FROM fp GROUP BY fp)),
            hits AS (
              SELECT COUNT(*) AS n_cand,
                COUNT(CASE WHEN a.fp = b.fp THEN 1 END) AS n_hit
              FROM cand JOIN fp a ON d1 = a.doc_id JOIN fp b ON d2 = b.doc_id)
            SELECT n_cand, n_truth, n_hit,
              CAST(FLOOR(CAST(n_hit AS DOUBLE) / NULLIF(n_cand, 0) * 1000000.0) AS DOUBLE) / 1000000.0 AS precision,
              CAST(FLOOR(CAST(n_hit AS DOUBLE) / NULLIF(n_truth, 0) * 1000000.0) AS DOUBLE) / 1000000.0 AS recall
            FROM hits, truth""")
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
      val cutoff = lpad(lower(hex(floor(col("rate") * lit(4294967296.0))
        .cast("long"))), 8, "0")
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
                  < lpad(lower(to_hex(CAST(FLOOR(rate * 4294967296.0) AS BIGINT))), 8, '0')
            GROUP BY d.source ORDER BY d.source""")
  )

  // --------------------------------------------------------------- q141
  /** Blocked exact cosine range search: all pairs within a label block
    * with cosine ≥ τ (0.25 here) — the "find everything semantically identical to
    * anything" primitive behind semantic-dedup verification and
    * retrieval-index QA. The label equi-join keys the shuffle and bounds
    * the quadratic strictly per block (the unblocked 100 TB path is
    * q32/q95's hyperplane-LSH bucketing — same shape, hash-derived
    * blocks); norms are computed ONCE per row before the pair join, and
    * the dot product is the codegen'd strict left-fold (FloatVectorDot),
    * so scores are bit-stable and DuckDB-oracle-able like q29.
    */
  val q141 = QuerySpec(
    "q141_cosine_range_search",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("label"), col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      val a = e.select(col("label"), col("vec_id").as("id1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
      val b = e.select(col("label"), col("vec_id").as("id2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
      val cos = ffloor(Similarity.cosineFromParts(
        Similarity.dot(col("e1"), col("e2")), col("n1"), col("n2")), 6)
      a.join(b, Seq("label")).filter(col("id1") < col("id2"))
        .select(col("label"), col("id1"), col("id2"), cos.as("cos"))
        .filter(col("cos") >= 0.25)
        .orderBy("label", "id1", "id2")
    },
    Some("""WITH e AS (
              SELECT label, vec_id, embedding,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (x, y) -> x + y)) AS nrm
              FROM embeddings),
            pairs AS (
              SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                  (x, y) -> x + y) AS dot,
                a.nrm AS n1, b.nrm AS n2
              FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
            SELECT label, id1, id2,
              CAST(FLOOR(dot / NULLIF(n1 * n2, 0.0) * 1000000.0) AS DOUBLE) / 1000000.0 AS cos
            FROM pairs
            WHERE CAST(FLOOR(dot / NULLIF(n1 * n2, 0.0) * 1000000.0) AS DOUBLE) / 1000000.0 >= 0.25
            ORDER BY label, id1, id2""")
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

  // --------------------------------------------------------------- q144
  /** Nearest-neighbor cosine histogram: for every vector, the max cosine
    * to any other vector in its label block, binned at 0.05 — the
    * "how close is this corpus to self-duplication in embedding space"
    * diagnostic that sets the semantic-dedup threshold BEFORE running it
    * (q95 consumes the cut point this histogram justifies). Same blocked
    * pair join as q141; per-vector max is a keyed aggregate; the
    * histogram is ≤41 bins.
    */
  val q144 = QuerySpec(
    "q144_nn_cosine_histogram",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("label"), col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      val a = e.select(col("label"), col("vec_id").as("id1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
      val b = e.select(col("label"), col("vec_id").as("id2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
      val cos = ffloor(Similarity.cosineFromParts(
        Similarity.dot(col("e1"), col("e2")), col("n1"), col("n2")), 6)
      val pairs = a.join(b, Seq("label")).filter(col("id1") =!= col("id2"))
        .select(col("id1").as("vid"), cos.as("cos"))
        .filter(col("cos").isNotNull)
      pairs.groupBy("vid").agg(max(col("cos")).as("nn_cos"))
        .groupBy(floor(col("nn_cos") * 20).cast("int").as("bin"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy("bin")
    },
    Some("""WITH e AS (
              SELECT label, vec_id, embedding,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (x, y) -> x + y)) AS nrm
              FROM embeddings),
            pairs AS (
              SELECT a.vec_id AS vid,
                CAST(FLOOR(
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(range(1, len(a.embedding) + 1),
                      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                    (x, y) -> x + y)
                  / NULLIF(a.nrm * b.nrm, 0.0) * 1000000.0) AS DOUBLE) / 1000000.0 AS cos
              FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
            nn AS (
              SELECT vid, MAX(cos) AS nn_cos FROM pairs
              WHERE cos IS NOT NULL GROUP BY vid)
            SELECT CAST(FLOOR(nn_cos * 20) AS INT) AS bin, COUNT(*) AS n_vecs
            FROM nn GROUP BY 1 ORDER BY 1""")
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

  val all: Seq[QuerySpec] = Seq(q136, q137, q139, q140, q141, q142, q144, q145)
}
