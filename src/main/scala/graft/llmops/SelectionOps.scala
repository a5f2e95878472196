package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops.{asciiLower, asciiLowerSql, ffloor}

/** Budgeted-selection operators — the planning layer that decides WHAT
  * goes into a training run once the corpus is profiled: how a global
  * token budget spreads across sources under per-source repeat caps
  * (water-filling), what sequence batching wastes on padding, and which
  * documents buy the most vocabulary coverage (greedy set cover).
  *
  * The reference has no query surface (`OSSStorage.java:73-75` — its
  * sink cannot read back); these follow the repo's exact-integer
  * discipline: every allocation/selection decision is integer
  * arithmetic (cross-multiplied comparisons, floor division, explicit
  * largest-remainder distribution), so the DuckDB oracle replays the
  * identical decisions and the rows hash-match.
  */
object SelectionOps {

  // --------------------------------------------------------------- q206
  /** Multi-epoch token-budget water-filling (the budgeted generalization
    * of q71's UniMax rates): given per-source token counts n_l, a repeat
    * cap of E = 2 epochs (cap_l = 2·n_l), and a global budget
    * B = floor(1.9 · Σn_l), find the water level λ with
    * Σ min(cap_l, λ) = B and allocate alloc_l = min(cap_l, λ) —
    * low-resource sources saturate at their cap, high-resource sources
    * split the remainder evenly. This IS the allocation rule behind
    * UniMax-style data budgets (Chung et al., 2023): epochs capped,
    * leftover budget spread uniformly over un-capped sources.
    *
    * Exact-integer solve on the G-row source table: sort caps ascending
    * (source tiebreak), k* = the largest count of capped sources where
    * the level clears the k-th cap — validity is the CROSS-MULTIPLIED
    * test B − P_k ≥ cap_(k)·(G−k), no division — then
    * λ = (B − P_k*) div (G−k*) with the remainder r handed out as +1
    * tokens to the first r un-capped sources in sort order
    * (largest-remainder rule, q71's integer-min normalizer spirit:
    * allocations sum to EXACTLY B). All windows/aggregates run over G
    * rows; the corpus is touched by ONE per-source count aggregate.
    */
  val q206 = QuerySpec(
    "q206_token_waterfill",
    (s, d) => {
      val perSrc = Tables.documents(s, d)
        .select(col("source"), size(split(asciiLower(col("text")), " ")).as("nt"))
        .groupBy("source").agg(sum(col("nt").cast("long")).as("n_tokens"))
        .withColumn("cap", col("n_tokens") * 2)
      val wAll = Window.partitionBy()
      val wOrd = Window.partitionBy().orderBy(col("cap"), col("source"))
      // Materialized: consumed three times (k* aggregate, the λ row, the
      // final allocation) — without the cut each consumer replays the
      // corpus tokenization. G rows; the corpus is scanned ONCE.
      val ranked = graft.core.Materialize(perSrc
        .withColumn("g", count(lit(1)).over(wAll))
        .withColumn("budget", expr("(sum(n_tokens) over () * 19) div 10"))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("pfx", sum("cap").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      // k-candidate validity: level clears this row's cap if the budget
      // left after paying all caps ≤ this one covers (G−k)·cap_(k).
      // k = rn (this row and everything before it capped).
      val kStar = ranked
        .select(max(when(
          col("budget") - col("pfx") >= col("cap") * (col("g") - col("rn")),
          col("rn")).otherwise(lit(0))).as("k"))
      val lam = ranked.join(broadcast(kStar),
          col("rn") === col("k"), "right")
        .select(col("k"),
          coalesce(col("pfx"), lit(0L)).as("pk"))
      ranked.crossJoin(broadcast(lam))
        .withColumn("lambda", expr("(budget - pk) div (g - k)"))
        .withColumn("rem", col("budget") - col("pk") - col("lambda") * (col("g") - col("k")))
        .withColumn("capped", col("rn") <= col("k"))
        .withColumn("alloc",
          when(col("capped"), col("cap"))
            .otherwise(col("lambda") +
              when(col("rn") - col("k") <= col("rem"), 1L).otherwise(0L)))
        .select(col("source"), col("n_tokens"), col("cap"), col("capped"),
          col("alloc"),
          ffloor(col("alloc").cast("double") / col("n_tokens"), 4).as("epochs"))
        .orderBy("source")
    },
    Some(s"""WITH per AS (
              SELECT source,
                CAST(SUM(len(string_split(${asciiLowerSql("text")}, ' '))) AS BIGINT)
                  AS n_tokens
              FROM documents GROUP BY 1),
            caps AS (SELECT source, n_tokens, n_tokens * 2 AS cap FROM per),
            ranked AS (
              SELECT source, n_tokens, cap,
                CAST(COUNT(*) OVER () AS BIGINT) AS g,
                CAST(SUM(n_tokens) OVER () * 19 // 10 AS BIGINT) AS budget,
                CAST(ROW_NUMBER() OVER (ORDER BY cap, source) AS BIGINT) AS rn,
                CAST(SUM(cap) OVER (ORDER BY cap, source
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
              FROM caps),
            ks AS (
              SELECT MAX(CASE WHEN budget - pfx >= cap * (g - rn)
                         THEN rn ELSE 0 END) AS k
              FROM ranked),
            lamb AS (
              SELECT ks.k, COALESCE(r.pfx, 0) AS pk
              FROM ks LEFT JOIN ranked r ON r.rn = ks.k)
            SELECT source, n_tokens, cap, rn <= k AS capped,
              CASE WHEN rn <= k THEN cap
                   ELSE (budget - pk) // (g - k)
                     + CASE WHEN rn - k <= (budget - pk)
                         - ((budget - pk) // (g - k)) * (g - k)
                       THEN 1 ELSE 0 END
              END AS alloc,
              CAST(FLOOR(CAST(CASE WHEN rn <= k THEN cap
                   ELSE (budget - pk) // (g - k)
                     + CASE WHEN rn - k <= (budget - pk)
                         - ((budget - pk) // (g - k)) * (g - k)
                       THEN 1 ELSE 0 END
                   END AS DOUBLE) / n_tokens * 10000.0) AS DOUBLE) / 10000.0
                AS epochs
            FROM ranked CROSS JOIN lamb
            ORDER BY source""")
  )

  // --------------------------------------------------------------- q207
  /** Sequence-padding waste audit — what fraction of accelerator tokens
    * a batch spends on padding, under (a) naive pad-to-max-seq-len (512)
    * and (b) length-bucketed batching (pad to the 64-token bucket
    * ceiling) — the measurement that justifies length-bucketed or packed
    * (q64) batching. Per document: kept = min(n_tok, 512) (the rest is
    * truncation, counted separately); bucket ceiling = ⌈kept/64⌉·64.
    * One narrow scan → per-bucket aggregate (≤ 8 groups) with exact
    * integer token sums; the two waste rates are one double division
    * each at the end. Output is the per-bucket table plus rates.
    */
  val q207 = QuerySpec(
    "q207_padding_waste",
    (s, d) => {
      val perDoc = Tables.documents(s, d)
        .select(size(split(asciiLower(col("text")), " ")).cast("long").as("nt"))
        .withColumn("kept", least(col("nt"), lit(512L)))
        .withColumn("bucket", expr("((kept + 63) div 64) * 64"))
      perDoc.groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("kept").cast("long").as("kept_tokens"),
          sum(lit(512L) - col("kept")).cast("long").as("pad_naive"),
          sum(col("bucket") - col("kept")).cast("long").as("pad_bucketed"))
        .withColumn("waste_naive",
          ffloor(col("pad_naive").cast("double") /
            (col("kept_tokens") + col("pad_naive")), 4))
        .withColumn("waste_bucketed",
          ffloor(col("pad_bucketed").cast("double") /
            (col("kept_tokens") + col("pad_bucketed")), 4))
        .orderBy("bucket")
    },
    Some(s"""WITH per AS (
              SELECT LEAST(CAST(len(string_split(${asciiLowerSql("text")}, ' '))
                  AS BIGINT), 512) AS kept
              FROM documents),
            b AS (
              SELECT kept, ((kept + 63) // 64) * 64 AS bucket FROM per),
            a AS (
              SELECT bucket, COUNT(*) AS n_docs,
                CAST(SUM(kept) AS BIGINT) AS kept_tokens,
                CAST(SUM(512 - kept) AS BIGINT) AS pad_naive,
                CAST(SUM(bucket - kept) AS BIGINT) AS pad_bucketed
              FROM b GROUP BY 1)
            SELECT bucket, n_docs, kept_tokens, pad_naive, pad_bucketed,
              CAST(FLOOR(CAST(pad_naive AS DOUBLE)
                / (kept_tokens + pad_naive) * 10000.0) AS DOUBLE) / 10000.0
                AS waste_naive,
              CAST(FLOOR(CAST(pad_bucketed AS DOUBLE)
                / (kept_tokens + pad_bucketed) * 10000.0) AS DOUBLE) / 10000.0
                AS waste_bucketed
            FROM a ORDER BY bucket""")
  )

  // --------------------------------------------------------------- q208
  /** Greedy set-cover document selection: pick K = 5 documents that
    * together cover the most DISTINCT TRIGRAMS — the eval-set/seed-corpus
    * construction step ("which docs exercise the most phrase surface"),
    * the lexical twin of q178's k-center coreset in embedding space.
    * Trigrams, not unigrams: the synthetic unigram vocabulary is so
    * small one document covers it entirely (greedy ends after one pick);
    * the trigram universe (~16k at sf0.01) gives the greedy a real
    * 5-round trajectory — and is what an eval-coverage selection keys on
    * in practice (phrase diversity, not word diversity).
    * Classic greedy (1−1/e approximation): each round picks the doc
    * with the most not-yet-covered trigrams (ties: lowest doc_id), then
    * marks its trigrams covered.
    *
    * Scale shape per round: one anti-join of the (doc, term) presence
    * table against the covered-term set (term-keyed, the set is ≤
    * K·max_doc_terms rows — broadcast-small by construction), one
    * doc-keyed count, one 1-row TakeOrdered argmax (q178's driver-state
    * contract: K ids total). The presence table is Materialized ONCE;
    * the corpus text is never re-tokenized across rounds. The DuckDB
    * oracle replays the identical greedy as five unrolled CTE rounds —
    * selection ties and gain counts are exact integers, so the full
    * selection trace hash-matches.
    */
  val q208 = QuerySpec(
    "q208_greedy_set_cover",
    (s, d) => {
      val spark = s
      import org.apache.spark.sql.DataFrame
      val pres = graft.core.Materialize(
        Dedup.shingles(Tables.documents(s, d), 3)
          .select(col("doc_id"), col("shingle").as("term")))
      var covered: DataFrame = null
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      var round = 1
      var exhausted = false
      while (round <= 5 && !exhausted) {
        val cand = if (covered == null) pres
          else pres.join(broadcast(covered), Seq("term"), "left_anti")
        val top = cand.groupBy("doc_id").agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .collect()
        // Vocabulary exhausted before K picks: every remaining doc has
        // zero uncovered terms. The oracle's round-k CTE is empty in the
        // same state, so both engines stop emitting rows here.
        if (top.isEmpty) exhausted = true
        else {
          val id = top(0).getLong(0); val gain = top(0).getLong(1)
          picks += ((id, gain, round))
          val newTerms = pres.filter(col("doc_id") === id).select("term")
          covered = graft.core.Materialize(
            if (covered == null) newTerms else covered.union(newTerms).distinct())
          round += 1
        }
      }
      import spark.implicits._
      picks.toSeq.toDF("doc_id", "gain", "round")
        .select(col("round"), col("doc_id"), col("gain"))
        .orderBy("round")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 3),
            pres AS (
              SELECT DISTINCT doc_id, bg AS term FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2])) AS bg
                FROM toks)),
            p1 AS (
              SELECT doc_id, COUNT(*) AS gain FROM pres GROUP BY 1
              ORDER BY gain DESC, doc_id LIMIT 1),
            c1 AS (SELECT DISTINCT term FROM pres
                   WHERE doc_id = (SELECT doc_id FROM p1)),
            p2 AS (
              SELECT doc_id, COUNT(*) AS gain FROM pres
              WHERE term NOT IN (SELECT term FROM c1)
              GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c2 AS (SELECT term FROM c1 UNION
                   SELECT DISTINCT term FROM pres
                   WHERE doc_id = (SELECT doc_id FROM p2)),
            p3 AS (
              SELECT doc_id, COUNT(*) AS gain FROM pres
              WHERE term NOT IN (SELECT term FROM c2)
              GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c3 AS (SELECT term FROM c2 UNION
                   SELECT DISTINCT term FROM pres
                   WHERE doc_id = (SELECT doc_id FROM p3)),
            p4 AS (
              SELECT doc_id, COUNT(*) AS gain FROM pres
              WHERE term NOT IN (SELECT term FROM c3)
              GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c4 AS (SELECT term FROM c3 UNION
                   SELECT DISTINCT term FROM pres
                   WHERE doc_id = (SELECT doc_id FROM p4)),
            p5 AS (
              SELECT doc_id, COUNT(*) AS gain FROM pres
              WHERE term NOT IN (SELECT term FROM c4)
              GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1)
            SELECT 1 AS round, doc_id, gain FROM p1
            UNION ALL SELECT 2, doc_id, gain FROM p2
            UNION ALL SELECT 3, doc_id, gain FROM p3
            UNION ALL SELECT 4, doc_id, gain FROM p4
            UNION ALL SELECT 5, doc_id, gain FROM p5
            ORDER BY round""")
  )

  val all: Seq[QuerySpec] = Seq(q206, q207, q208)
}
