package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Ops.{asciiLower, asciiLowerSql, fanOut, ffloor}
import org.apache.spark.sql.types.DecimalType

/** Pre-training corpus planning operators: LM-quality scoring, segment-level
  * dedup, token-budget allocation, and context-length packing audit — the
  * four decisions a pipeline makes BETWEEN cleaning (TextAnalysis/Dedup) and
  * writing shards (CorpusPipeline/q64). All are scan-plus-keyed-aggregate
  * plans; nothing here windows over a corpus stratum or collects to the
  * driver.
  */
object PretrainOps {

  /** (doc_id, term, tf) — the per-doc term-frequency table (one tokenize
    * pass + one keyed aggregate; the same start as q55/q56). The fan-out
    * is KEYED by doc_id (round 15, the tokensWithPos idiom, guide §2.4):
    * hashpartitioning(doc_id) already satisfies the (doc_id, term)
    * aggregate's clustered distribution, so the exploded TOKEN stream is
    * never exchanged — only document rows cross the one shuffle, and
    * per-doc consumers downstream (`lens` groupBy(doc_id)) keep riding
    * the same partitioning.
    */
  private[llmops] def termFreq(docs: DataFrame): DataFrame =
    fanOut(docs, col("doc_id"))
      .select(col("doc_id"), explode(split(asciiLower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  // ---------------------------------------------------------------- q84
  /** Unigram-LM surprisal score — the CCNet/Wikipedia-LM quality proxy:
    * train unigram probabilities ON the corpus itself, score each document
    * by its mean per-token surprisal -ln p(t). Low = repetitive/templated
    * text, high = rare-token soup (both tails get filtered in production;
    * the score is the input to that gate).
    *
    * Scale shape: the vocabulary table (term, ctf) is the same one q78's
    * novelty join uses — the doc→vocab join rides the term aggregate's
    * shuffle; the corpus total is a broadcast single-row aggregate. No
    * windows, no collect.
    *
    * Determinism: per-TERM surprisal is truncated to integer MICRO-nats
    * (floor(ln(N/ctf)·1e6) as BIGINT) so every downstream op — tf-weighted
    * sum, mean — is pure integer/IEEE arithmetic, identical across engines;
    * a sub-ulp ln() divergence can only flip a value sitting exactly on a
    * 1e-6 boundary (q55's accepted ffloor contract).
    */
  val q84 = QuerySpec(
    "q84_unigram_surprisal",
    (s, d) => {
      // tf feeds ctf, the corpus total, and the surprisal join probe —
      // materialize once (round 15, q107's idiom).
      val tf = graft.core.Materialize(termFreq(Tables.documents(s, d)))
      val ctf = tf.groupBy("term").agg(sum("tf").cast("long").as("ctf"))
      val n = tf.agg(sum("tf").cast("long").as("n_total"))
      val sMicro = floor(
        log(col("n_total").cast("double") / col("ctf").cast("double")) * lit(1e6))
        .cast("long")
      tf.join(ctf, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("tf"), sMicro.as("s_micro"))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("s_micro")).cast("long").as("__total_micro"),
          sum("tf").cast("long").as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          ffloor(col("__total_micro").cast("double") / lit(1e6) /
            col("n_tokens").cast("double"), 4).as("mean_surprisal"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
                   WHERE term <> '' GROUP BY 1, 2),
            ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
            n AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total FROM tf),
            s AS (SELECT term,
                CAST(FLOOR(ln(CAST(n_total AS DOUBLE) / CAST(ctf AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS s_micro
              FROM ctf CROSS JOIN n)
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
              CAST(FLOOR(CAST(SUM(tf * s_micro) AS DOUBLE) / 1000000.0
                / CAST(SUM(tf) AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                AS mean_surprisal
            FROM tf JOIN s USING (term)
            GROUP BY doc_id ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q85
  /** Segment-level first-occurrence dedup — the C4/RefinedWeb idiom one
    * level below document dedup: split every doc into non-overlapping
    * 50-token chunks, keep each distinct chunk ONLY at its first corpus
    * occurrence (lowest doc_id, then lowest chunk_idx), and report each
    * document's surviving-chunk fraction. Docs full of already-seen
    * segments (mirrors, quote farms, boilerplate shells) score near 0.
    *
    * The winner per chunk-hash is ONE keyed aggregate — min of the
    * integer-encoded position doc_id·100000+chunk_idx (chunk_idx < 100000
    * always: even a 5M-token doc has 100k chunks) — and per-doc kept
    * counts are an aggregate OVER THE WINNER TABLE (one row per distinct
    * chunk), never a join back to the corpus-sized chunk list: a
    * million-way duplicated boilerplate chunk contributes one winner row,
    * so hot hashes cannot skew a probe side.
    */
  val q85 = QuerySpec(
    "q85_chunk_dedup",
    (s, d) => {
      val chunks = CorpusPipeline.chunk(Tables.documents(s, d), chunkSize = 50, overlap = 0)
        .select(col("doc_id"), col("chunk_idx"),
          md5(col("chunk_text")).as("h"),
          (col("doc_id") * lit(100000L) + col("chunk_idx")).as("pos"))
      val perDoc = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      val winners = chunks.groupBy("h").agg(min("pos").as("wpos"))
        .select(expr("wpos div 100000").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
      perDoc.join(winners, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .withColumn("kept_frac",
          ffloor(col("n_kept").cast("double") / col("n_chunks").cast("double"), 4))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            chunks AS (
              SELECT doc_id, chunk_idx,
                md5(array_to_string(list_slice(ts, chunk_idx * 50 + 1,
                  LEAST(chunk_idx * 50 + 50, len(ts))), ' ')) AS h,
                doc_id * 100000 + chunk_idx AS pos
              FROM (SELECT doc_id, ts,
                      unnest(range(0, (len(ts) - 1) // 50 + 1)) AS chunk_idx
                    FROM toks)),
            per_doc AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY 1),
            winners AS (
              SELECT MIN(pos) // 100000 AS doc_id FROM chunks GROUP BY h),
            kept AS (SELECT doc_id, COUNT(*) AS n_kept FROM winners GROUP BY 1)
            SELECT p.doc_id, CAST(p.n_chunks AS BIGINT) AS n_chunks,
              CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
              CAST(FLOOR(CAST(COALESCE(k.n_kept, 0) AS DOUBLE)
                / CAST(p.n_chunks AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                AS kept_frac
            FROM per_doc p LEFT JOIN kept k USING (doc_id)
            ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q86
  /** Token-budget mixture allocation — the "how many epochs of each source"
    * planner table: given per-source token inventories, a total training
    * budget (60% of the corpus here), and an epoch cap (2× — repeating
    * data beyond a couple of epochs hurts), allocate uniformly, cap, and
    * redistribute the remainder to uncapped sources in ONE equal-share
    * round (the deterministic closed form both engines compute exactly;
    * production iterates the same step to a fixpoint). Complements q60/q71:
    * those pick sampling RATES, this one plans token VOLUMES.
    *
    * Everything after the single corpus-scale token count is arithmetic on
    * a k-row (per-source) table with two broadcast single-row aggregates —
    * scale-free by construction. Pure integer math (div, least): no
    * engine can disagree, and no intermediate exceeds 2× the corpus total
    * (no overflow at any conceivable scale).
    */
  val q86 = QuerySpec(
    "q86_token_budget_mixture",
    (s, d) => {
      val perSrc = fanOut(Tables.documents(s, d))
        .groupBy("source")
        .agg(sum(size(split(asciiLower(col("text")), " ")).cast("long"))
          .cast("long").as("t_avail"))
      val tot = perSrc.agg(sum("t_avail").cast("long").as("t_total"),
        count(lit(1)).as("k"))
      val base = perSrc.crossJoin(broadcast(tot))
        .withColumn("budget", expr("t_total * 6 div 10"))
        .withColumn("cap", col("t_avail") * 2)
        .withColumn("base", least(col("cap"), expr("budget div k")))
      val second = base.agg(
        (max("budget") - sum("base")).cast("long").as("leftover"),
        sum(when(col("cap") > col("base"), lit(1L)).otherwise(lit(0L)))
          .cast("long").as("n_uncapped"))
      base.crossJoin(broadcast(second))
        .withColumn("extra",
          when(col("cap") > col("base") && col("n_uncapped") > 0,
            least(col("cap") - col("base"), expr("leftover div n_uncapped")))
            .otherwise(lit(0L)))
        .select(col("source"), col("t_avail"),
          (col("base") + col("extra")).as("t_alloc"),
          expr("(base + extra) * 1000 div t_avail").as("epochs_milli"))
        .orderBy("source")
    },
    Some(s"""WITH per_src AS (
              SELECT source,
                CAST(SUM(len(string_split(${asciiLowerSql("text")}, ' '))) AS BIGINT) AS t_avail
              FROM documents GROUP BY source),
            tot AS (SELECT CAST(SUM(t_avail) AS BIGINT) AS t_total,
                      COUNT(*) AS k FROM per_src),
            base AS (
              SELECT source, t_avail,
                t_total * 6 // 10 AS budget,
                t_avail * 2 AS cap,
                LEAST(t_avail * 2, (t_total * 6 // 10) // k) AS base
              FROM per_src CROSS JOIN tot),
            second AS (
              SELECT CAST(MAX(budget) - SUM(base) AS BIGINT) AS leftover,
                CAST(SUM(CASE WHEN cap > base THEN 1 ELSE 0 END) AS BIGINT) AS n_uncapped
              FROM base)
            SELECT source, t_avail,
              CAST(base + CASE WHEN cap > base AND n_uncapped > 0
                THEN LEAST(cap - base, leftover // n_uncapped) ELSE 0 END AS BIGINT)
                AS t_alloc,
              CAST((base + CASE WHEN cap > base AND n_uncapped > 0
                THEN LEAST(cap - base, leftover // n_uncapped) ELSE 0 END) * 1000
                // t_avail AS BIGINT) AS epochs_milli
            FROM base CROSS JOIN second ORDER BY source""")
  )

  // ---------------------------------------------------------------- q87
  /** Context-length packing audit: bucket documents by power-of-two token
    * length (bucket = bit width of the count — floor(log2)+1, computed as
    * the length of the base-2 string so there is no float log near exact
    * powers) and report, per bucket, the document count, token volume, and
    * the sequence count + pad waste a naive one-doc-per-sequence loader
    * would pay at a 512-token context. The table that says whether packing
    * (q64) is worth running and where the tokens actually live. Pure
    * per-row integer expressions + one tiny aggregate.
    */
  val q87 = QuerySpec(
    "q87_packing_audit",
    (s, d) => {
      val L = 512L
      val n = size(split(asciiLower(col("text")), " ")).cast("long")
      fanOut(Tables.documents(s, d))
        .select(n.as("n_tokens"))
        .withColumn("bucket", length(bin(col("n_tokens"))).cast("int"))
        .withColumn("seqs", expr(s"(n_tokens + ${L - 1}) div $L"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("total_tokens"),
          sum("seqs").cast("long").as("n_seqs"),
          (sum("seqs") * lit(L) - sum("n_tokens")).cast("long").as("pad_tokens"))
        .orderBy("bucket")
    },
    Some(s"""WITH t AS (
              SELECT len(string_split(${asciiLowerSql("text")}, ' ')) AS n_tokens
              FROM documents),
            b AS (
              SELECT n_tokens,
                CAST(length(to_base(n_tokens, 2)) AS INTEGER) AS bucket,
                (n_tokens + 511) // 512 AS seqs
              FROM t)
            SELECT bucket, COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              CAST(SUM(seqs) AS BIGINT) AS n_seqs,
              CAST(SUM(seqs) * 512 - SUM(n_tokens) AS BIGINT) AS pad_tokens
            FROM b GROUP BY bucket ORDER BY bucket""")
  )

  // ---------------------------------------------------------------- q88
  /** Cross-source 5-gram overlap matrix — the source-level dedup planner:
    * before mixing sources, measure how much content they share (mirror
    * sites, syndicated feeds, common boilerplate). For each source pair
    * with any overlap: shared distinct 5-grams and the Jaccard over the
    * two sources' gram sets (inclusion–exclusion for the union).
    *
    * Scale shape: the per-source gram set is a distinct aggregate; the
    * pairwise intersection is an equi-join ON THE GRAM, and a gram held by
    * k sources fans out to at most k(k-1)/2 pair rows — bounded by the
    * SOURCE count, not the corpus, so no hot-key cap is needed (the rare
    * place where the quadratic term is over a genuinely tiny set). Pairs
    * with zero overlap are absent by construction.
    */
  val q88 = QuerySpec(
    "q88_source_overlap",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val grams = Dedup.shingles(docs, 5)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle").distinct()
      val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
      grams.as("a")
        .join(grams.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("source").as("src_a"), col("n").as("__na")), "src_a")
        .join(sizes.select(col("source").as("src_b"), col("n").as("__nb")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          ffloor(col("n_shared").cast("double") /
            (col("__na") + col("__nb") - col("n_shared")).cast("double"), 4)
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, source, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 5),
            grams AS (
              SELECT DISTINCT source, g FROM (
                SELECT source,
                  unnest(list_transform(range(1, len(ts) - 3),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                      || '_' || ts[i+4])) AS g
                FROM toks)),
            sizes AS (SELECT source, COUNT(*) AS n FROM grams GROUP BY 1),
            pairs AS (
              SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
              FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
              GROUP BY 1, 2)
            SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
              CAST(FLOOR(CAST(n_shared AS DOUBLE)
                / CAST(sa.n + sb.n - n_shared AS DOUBLE) * 10000.0) AS DOUBLE)
                / 10000.0 AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.source = src_a
            JOIN sizes sb ON sb.source = src_b
            ORDER BY src_a, src_b""")
  )

  // ---------------------------------------------------------------- q89
  /** Vocabulary frequency spectrum (Zipf audit): bucket every vocabulary
    * type by the bit width of its corpus frequency (1, 2–3, 4–7, …) and
    * report types and token mass per bucket — the curve that sizes a BPE
    * vocabulary and predicts how much mass a min-frequency cutoff drops.
    * Two keyed aggregates (term count → bucket rollup); the spectrum
    * table itself is ~40 rows at any corpus size.
    */
  val q89 = QuerySpec(
    "q89_zipf_spectrum",
    (s, d) => {
      fanOut(Tables.documents(s, d))
        .select(explode(split(asciiLower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("ctf"))
        .withColumn("bucket", length(bin(col("ctf"))).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_types"),
          sum("ctf").cast("long").as("token_mass"))
        .orderBy("bucket")
    },
    Some(s"""WITH toks AS (
              SELECT unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            ctf AS (SELECT term, COUNT(*) AS ctf FROM toks
                    WHERE term <> '' GROUP BY 1)
            SELECT CAST(length(to_base(ctf, 2)) AS INTEGER) AS bucket,
              COUNT(*) AS n_types,
              CAST(SUM(ctf) AS BIGINT) AS token_mass
            FROM ctf GROUP BY bucket ORDER BY bucket""")
  )

  // ---------------------------------------------------------------- q90
  /** Tokenizer-efficiency audit per language: chars per token and UTF-8
    * bytes per char — the fertility numbers that decide whether a
    * tokenizer (and a byte budget) fits a multilingual corpus. Byte
    * length is `octet_length` (Spark) / `strlen` (DuckDB); char length is
    * `length` on both. One scan, one tiny aggregate; ratios guarded
    * against empty-text groups.
    */
  val q90 = QuerySpec(
    "q90_tokenizer_efficiency",
    (s, d) => {
      val n = size(split(asciiLower(col("text")), " ")).cast("long")
      fanOut(Tables.documents(s, d))
        .select(col("lang"), n.as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("total_tokens"),
          sum("n_chars").cast("long").as("total_chars"),
          sum("n_bytes").cast("long").as("total_bytes"))
        .withColumn("chars_per_token",
          when(col("total_tokens") > 0,
            ffloor(col("total_chars").cast("double") /
              col("total_tokens").cast("double"), 4)))
        .withColumn("bytes_per_char",
          when(col("total_chars") > 0,
            ffloor(col("total_bytes").cast("double") /
              col("total_chars").cast("double"), 4)))
        .orderBy("lang")
    },
    Some(s"""WITH t AS (
              SELECT lang,
                len(string_split(${asciiLowerSql("text")}, ' ')) AS n_tokens,
                length(text) AS n_chars,
                strlen(text) AS n_bytes
              FROM documents)
            SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
              CASE WHEN SUM(n_tokens) > 0 THEN
                CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE)
                  / CAST(SUM(n_tokens) AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                END AS chars_per_token,
              CASE WHEN SUM(n_chars) > 0 THEN
                CAST(FLOOR(CAST(SUM(n_bytes) AS DOUBLE)
                  / CAST(SUM(n_chars) AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                END AS bytes_per_char
            FROM t GROUP BY lang ORDER BY lang""")
  )

  // --------------------------------------------------------------- q104
  /** BPE merge induction — train the TOKENIZER on the corpus: two unrolled
    * rounds of byte-pair-encoding merge selection (Sennrich et al., applied
    * at word granularity): count adjacent-pair frequencies over the current
    * token stream, pick the winner (count desc, then lexicographic — the
    * deterministic tie-break both engines apply), rewrite the stream with
    * winner occurrences merged, repeat. Reports each round's winning pair,
    * its count, and the stream length after the merge — the artifact a
    * vocab-induction run logs per merge.
    *
    * The REWRITE is the subtle half: BPE merges left-to-right
    * NON-OVERLAPPING, so in a run of consecutive matches (`a a a` under
    * winner (a,a)) only even offsets merge. That sequential-looking rule is
    * expressed relationally via gaps-and-islands: mark match-run STARTS
    * (match whose predecessor is not a match), carry the latest run-start
    * position forward with a running max, and merge exactly the matches at
    * even distance from their run start; the row AFTER a merge is consumed
    * (lag). Every window partitions by doc_id — bounded by document length,
    * never a corpus stratum — and each round is a fixed number of
    * window/aggregate passes, so K rounds cost K·O(corpus) with no
    * driver-side data movement (the winner is a broadcast single row).
    * Production runs the same loop for 30k rounds on a sampled corpus;
    * two rounds is the exactly-checkable contract (q69's bounded-K idiom).
    */
  val q104 = QuerySpec(
    "q104_bpe_merges",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val wRun = wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)

      def winner(st: DataFrame): DataFrame =
        st.select(col("doc_id"), col("pos"), col("tok"),
            lead("tok", 1).over(wDoc).as("nxt"))
          .filter(col("nxt").isNotNull)
          .groupBy("tok", "nxt").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok"), col("nxt")).limit(1)
          .select(col("tok").as("w1"), col("nxt").as("w2"), col("cnt"))

      def mergeRound(st: DataFrame, win: DataFrame): DataFrame =
        st.crossJoin(broadcast(win.select("w1", "w2")))
          .withColumn("nxt", lead("tok", 1).over(wDoc))
          .withColumn("mtch",
            coalesce(col("tok") === col("w1") && col("nxt") === col("w2"), lit(false)))
          .withColumn("mstart",
            col("mtch") && !coalesce(lag("mtch", 1).over(wDoc), lit(false)))
          .withColumn("rstart", max(when(col("mstart"), col("pos"))).over(wRun))
          .withColumn("mrg",
            col("mtch") && (col("pos") - col("rstart")) % 2 === 0)
          .withColumn("consumed",
            coalesce(lag("mrg", 1).over(wDoc), lit(false)))
          .filter(!col("consumed"))
          .select(col("doc_id"),
            (row_number().over(wDoc) - 1).as("pos"),
            when(col("mrg"), concat_ws("_", col("tok"), col("nxt")))
              .otherwise(col("tok")).as("tok"))

      val t0 = Dedup.tokensWithPos(Tables.documents(s, d))
      // .limit(1) after each Materialize is a CARDINALITY WITNESS, not a
      // selection: winner() already ends in limit(1), but localCheckpoint
      // erases the structural proof (the plan becomes an opaque RDD scan),
      // and PlanGate deliberately distrusts RDD scans. Restating the 1-row
      // bound lets the gate prove the downstream crossJoins broadcast a
      // bounded side. Semantic no-op on a 1-row table.
      val win1 = graft.core.Materialize(winner(t0)).limit(1)
      val s1 = graft.core.Materialize(mergeRound(t0, win1))
      val win2 = graft.core.Materialize(winner(s1)).limit(1)
      val s2 = mergeRound(s1, win2)

      def report(round: Int, win: DataFrame, after: DataFrame): DataFrame =
        win.crossJoin(after.agg(count(lit(1)).as("tokens_after")))
          .select(lit(round).as("round"), col("w1"), col("w2"),
            col("cnt").as("pair_count"), col("tokens_after"))

      report(1, win1, s1).union(report(2, win2, s2)).orderBy("round")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            t0 AS (
              SELECT doc_id, i - 1 AS pos, ts[i] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM toks)),
            p1 AS (SELECT tok, nxt, COUNT(*) AS cnt FROM (
                     SELECT tok, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                     FROM t0)
                   WHERE nxt IS NOT NULL GROUP BY tok, nxt),
            win1 AS (SELECT tok AS w1, nxt AS w2, cnt FROM p1
                     ORDER BY cnt DESC, tok, nxt LIMIT 1),
            m1a AS (SELECT doc_id, pos, tok,
                      LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                    FROM t0),
            m1b AS (SELECT doc_id, pos, tok, nxt,
                      COALESCE(tok = w.w1 AND nxt = w.w2, FALSE) AS mtch
                    FROM m1a CROSS JOIN win1 w),
            m1c AS (SELECT *, (mtch AND NOT COALESCE(
                      LAG(mtch) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)) AS mstart
                    FROM m1b),
            m1d AS (SELECT *, MAX(CASE WHEN mstart THEN pos END)
                      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS rstart
                    FROM m1c),
            m1e AS (SELECT *, (mtch AND (pos - rstart) % 2 = 0) AS mrg FROM m1d),
            m1f AS (SELECT *, COALESCE(
                      LAG(mrg) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS consumed
                    FROM m1e),
            s1 AS (SELECT doc_id,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
                     CASE WHEN mrg THEN tok || '_' || nxt ELSE tok END AS tok
                   FROM m1f WHERE NOT consumed),
            p2 AS (SELECT tok, nxt, COUNT(*) AS cnt FROM (
                     SELECT tok, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                     FROM s1)
                   WHERE nxt IS NOT NULL GROUP BY tok, nxt),
            win2 AS (SELECT tok AS w1, nxt AS w2, cnt FROM p2
                     ORDER BY cnt DESC, tok, nxt LIMIT 1),
            m2a AS (SELECT doc_id, pos, tok,
                      LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                    FROM s1),
            m2b AS (SELECT doc_id, pos, tok, nxt,
                      COALESCE(tok = w.w1 AND nxt = w.w2, FALSE) AS mtch
                    FROM m2a CROSS JOIN win2 w),
            m2c AS (SELECT *, (mtch AND NOT COALESCE(
                      LAG(mtch) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)) AS mstart
                    FROM m2b),
            m2d AS (SELECT *, MAX(CASE WHEN mstart THEN pos END)
                      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS rstart
                    FROM m2c),
            m2e AS (SELECT *, (mtch AND (pos - rstart) % 2 = 0) AS mrg FROM m2d),
            m2f AS (SELECT *, COALESCE(
                      LAG(mrg) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS consumed
                    FROM m2e),
            s2 AS (SELECT doc_id,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
                     CASE WHEN mrg THEN tok || '_' || nxt ELSE tok END AS tok
                   FROM m2f WHERE NOT consumed)
            SELECT CAST(1 AS INTEGER) AS round, w1, w2, cnt AS pair_count,
              (SELECT COUNT(*) FROM s1) AS tokens_after FROM win1
            UNION ALL
            SELECT CAST(2 AS INTEGER), w1, w2, cnt,
              (SELECT COUNT(*) FROM s2) FROM win2
            ORDER BY round""")
  )

  // --------------------------------------------------------------- q105
  /** Curriculum-phase manifest: bucket documents into three training
    * phases by corpus-calibrated DIFFICULTY tertiles — difficulty = each
    * doc's integer mean micro-nat unigram surprisal (q84's signal, kept
    * in integer µ-nats via `div` so the tertile comparison is
    * integer-vs-integer). Curriculum schedules (easy→hard ordering,
    * Bengio et al.) consume exactly this table: per phase, the doc count,
    * token budget, and difficulty band.
    *
    * SCALE SHAPE: cutoffs come from the exact `percentile` AGGREGATE
    * (q43/q66's cross-engine idiom) over the per-doc difficulty table —
    * one doc-sized aggregate broadcast back as two scalars — then phase
    * assignment is a per-row comparison. No corpus-wide sort or rank
    * window (contrast ntile, which would serialize the corpus into one
    * task); at 100 TB the difficulty table is |docs| rows and the same
    * plan holds with percentile_approx swapped in by config if even that
    * table is too big for exact percentile's sketch.
    */
  val q105 = QuerySpec(
    "q105_curriculum_phases",
    (s, d) => {
      // tf feeds ctf, the corpus total, and the surprisal join probe —
      // materialize once (round 15, q107's idiom).
      val tf = graft.core.Materialize(termFreq(Tables.documents(s, d)))
      val ctf = tf.groupBy("term").agg(sum("tf").cast("long").as("ctf"))
      val n = tf.agg(sum("tf").cast("long").as("n_total"))
      val sMicro = floor(
        log(col("n_total").cast("double") / col("ctf").cast("double")) * lit(1e6))
        .cast("long")
      val diff = tf.join(ctf, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("tf"), sMicro.as("s_micro"))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("s_micro")).cast("long").as("tot"),
          sum("tf").cast("long").as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          expr("tot div n_tokens").as("dmicro"))
      val cuts = diff.agg(
        floor(expr("percentile(dmicro, 0.3333333333333333)")).cast("long").as("c1"),
        floor(expr("percentile(dmicro, 0.6666666666666666)")).cast("long").as("c2"))
      diff.crossJoin(broadcast(cuts))
        .select(col("n_tokens"), col("dmicro"),
          when(col("dmicro") <= col("c1"), 1)
            .when(col("dmicro") <= col("c2"), 2).otherwise(3).as("phase"))
        .groupBy("phase")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("total_tokens"),
          min("dmicro").as("min_dmicro"), max("dmicro").as("max_dmicro"))
        .orderBy("phase")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
                   WHERE term <> '' GROUP BY 1, 2),
            ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
            n AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total FROM tf),
            s AS (SELECT term,
                CAST(FLOOR(ln(CAST(n_total AS DOUBLE) / CAST(ctf AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS s_micro
              FROM ctf CROSS JOIN n),
            diff AS (
              SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                CAST(SUM(tf * s_micro) AS BIGINT) // CAST(SUM(tf) AS BIGINT) AS dmicro
              FROM tf JOIN s USING (term) GROUP BY doc_id),
            cuts AS (SELECT
                CAST(FLOOR(quantile_cont(dmicro, 0.3333333333333333)) AS BIGINT) AS c1,
                CAST(FLOOR(quantile_cont(dmicro, 0.6666666666666666)) AS BIGINT) AS c2
              FROM diff),
            ph AS (
              SELECT n_tokens, dmicro,
                CASE WHEN dmicro <= c1 THEN 1
                     WHEN dmicro <= c2 THEN 2 ELSE 3 END AS phase
              FROM diff CROSS JOIN cuts)
            SELECT phase, COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              MIN(dmicro) AS min_dmicro, MAX(dmicro) AS max_dmicro
            FROM ph GROUP BY phase ORDER BY phase""")
  )

  // --------------------------------------------------------------- q106
  /** Corpus heavy hitters — the two-pass sketch shape for frequent items
    * over an UNBOUNDED key domain (URLs, fingerprints, hosts — here
    * terms): pass 1 reduces the stream to ≤ k=256 Misra–Gries counters
    * ([[graft.functions.FreqSketchAgg]] — O(k) state, map-side partials,
    * arbitrary merge order); pass 2 re-counts ONLY the ≤ 256 candidate
    * keys exactly and keeps those at ≥ 0.5% of the stream.
    *
    * Why this is layout-independent (and thus oracle-able) even though MG
    * counter VALUES are order-dependent: with k=256 every term above
    * N/257 < 0.39% of the stream is GUARANTEED a counter in any
    * stream/merge order, so the candidate set is always a superset of the
    * ≥ 0.5% emit set, and the emitted counts are exact. The integer
    * predicate `cnt · 200 ≥ N` keeps the threshold engine-exact.
    *
    * Scale: contrast q89's full vocabulary aggregate — correct when the
    * key domain is vocab-bounded, but a corpus-cardinality key (URL,
    * fingerprint) makes that shuffle the size of the corpus. Here the
    * shuffle after partial aggregation is ≤ k rows per task for pass 1
    * and ≤ 256 keys' partial counts for pass 2.
    */
  val q106 = QuerySpec(
    "q106_heavy_hitters",
    (s, d) => {
      def terms = fanOut(Tables.documents(s, d))
        .select(explode(split(asciiLower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val cand = terms
        .agg(graft.functions.FreqSketch.freq_sketch(col("term"), 256).as("sk"))
        .select(explode(map_keys(col("sk"))).as("term"))
      val n = terms.agg(count(lit(1)).as("n_total"))
      terms.join(broadcast(cand), "term")
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(col("cnt") * lit(200L) >= col("n_total"))
        .select(col("term"), col("cnt"), col("n_total"),
          ffloor(col("cnt").cast("double") / col("n_total").cast("double"), 4)
            .as("freq"))
        .orderBy(col("cnt").desc, col("term"))
    },
    Some(s"""WITH t AS (
              SELECT unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tt AS (SELECT term FROM t WHERE term <> ''),
            n AS (SELECT COUNT(*) AS n_total FROM tt),
            c AS (SELECT term, COUNT(*) AS cnt FROM tt GROUP BY term)
            SELECT term, cnt, n_total,
              CAST(FLOOR(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE)
                * 10000.0) AS DOUBLE) / 10000.0 AS freq
            FROM c CROSS JOIN n
            WHERE cnt * 200 >= n_total
            ORDER BY cnt DESC, term""")
  )

  // --------------------------------------------------------------- q107
  /** Okapi BM25 retrieval scoring — the lexical ranking function every
    * retrieval/RAG pipeline starts from (and the harder sibling of q55's
    * TF-IDF: BM25 adds tf saturation and doc-length normalization). Query
    * terms are a constant literal set; each matching (doc, term) pair
    * scores idf·(tf·(k1+1))/(tf + k1·(1−b+b·len/avgdl)) with k1=1.2,
    * b=0.75.
    *
    * Determinism: the PER-PAIR score is truncated to integer micro-units
    * — idf is micro-truncated first (q84's contract), the saturation
    * fraction is one double expression with an explicitly-pinned op
    * order, and floor() lands the pair on an integer — so the per-doc SUM
    * is order-free integer arithmetic (double summation order would
    * differ between engines). Top-20 via sort-limit compiles to
    * TakeOrderedAndProject — per-partition heaps + one 20-row merge, no
    * global sort materialization at any corpus size.
    *
    * Scale shape: query terms broadcast (literal row set), df/avgdl are
    * term-table and single-row aggregates, the scored table is bounded by
    * docs-containing-a-query-term. Nothing shuffles except the tf
    * aggregate the corpus already pays.
    */
  val q107 = QuerySpec(
    "q107_bm25",
    (s, d) => {
      val queryTerms = Seq("spark", "join", "merge")
      val docs = Tables.documents(s, d)
      // tf feeds THREE plan consumers (lens, the query-term df, and the
      // scoring pipeline) — materialize once (round 15, q165's idiom: two
      // extra corpus tokenization passes would double the dominant cost
      // at 100 TB, and AQE exchange reuse across aliased subtrees is the
      // measured-intermittent mechanism the engine does not rely on).
      val tf = graft.core.Materialize(termFreq(docs))
      val lens = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("len"))
      val nAvg = lens.agg(
        count(lit(1)).cast("long").as("n_docs"),
        (sum("len").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      val df = tf.filter(col("term").isin(queryTerms: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
      val idfMicro = floor(log(
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1e6)).cast("long")
      val sat = (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(1.0) - lit(0.75) + lit(0.75) * (col("len").cast("double") / col("avgdl"))))
      val pairMicro = floor(col("idf_micro").cast("double") * sat).cast("long")
      tf.filter(col("term").isin(queryTerms: _*))
        .join(broadcast(df), "term")
        .join(lens, "doc_id")
        .crossJoin(broadcast(nAvg))
        .select(col("doc_id"), col("term"), col("tf"), col("len"), col("avgdl"),
          idfMicro.as("idf_micro"))
        .select(col("doc_id"), pairMicro.as("pair_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms_hit"),
          sum("pair_micro").cast("long").as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("n_terms_hit"), col("score_micro"),
          ffloor(col("score_micro").cast("double") / lit(1e6), 4).as("score"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
                   WHERE term <> '' GROUP BY 1, 2),
            lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1),
            navg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
                     FROM lens),
            qdf AS (SELECT term, COUNT(*) AS df FROM tf
                    WHERE term IN ('spark', 'join', 'merge') GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                CAST(FLOOR(
                  CAST(CAST(FLOOR(ln(
                    (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT) AS DOUBLE)
                  * ((CAST(tf AS DOUBLE) * 2.2)
                     / (CAST(tf AS DOUBLE) + 1.2
                        * (1.0 - 0.75 + 0.75 * (CAST(len AS DOUBLE) / avgdl))))
                ) AS BIGINT) AS pair_micro
              FROM tf
              JOIN qdf USING (term)
              JOIN lens ON tf.doc_id = lens.doc_id
              CROSS JOIN navg
              WHERE tf.term IN ('spark', 'join', 'merge'))
            SELECT doc_id, COUNT(*) AS n_terms_hit,
              CAST(SUM(pair_micro) AS BIGINT) AS score_micro,
              CAST(FLOOR(CAST(SUM(pair_micro) AS DOUBLE) / 1000000.0
                * 10000.0) AS DOUBLE) / 10000.0 AS score
            FROM scored GROUP BY doc_id
            ORDER BY score_micro DESC, doc_id LIMIT 20""")
  )

  val all: Seq[QuerySpec] =
    Seq(q84, q85, q86, q87, q88, q89, q90, q104, q105, q106, q107)
}
