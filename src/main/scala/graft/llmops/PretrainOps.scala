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
    * pass + one keyed aggregate; the same start as q55/q56).
    */
  private[llmops] def termFreq(docs: DataFrame): DataFrame =
    fanOut(docs)
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
      val tf = termFreq(Tables.documents(s, d))
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
      val grams = Dedup.shingles(fanOut(docs), 5)
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

      val t0 = Dedup.tokensWithPos(fanOut(Tables.documents(s, d)))
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
      val tf = termFreq(Tables.documents(s, d))
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
      val tf = termFreq(docs)
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

  // --------------------------------------------------------------- q116
  /** Contrastive two-view crop manifest — the training-example
    * constructor for contrastive/retrieval pretraining (Contriever/SimCSE
    * style): each document yields two half-length crops at
    * DETERMINISTIC hash-derived offsets (salted md5 → integer offset, the
    * q92/q99 membership idiom — no RNG state, rerunning the pipeline
    * regenerates byte-identical views), with the overlap-token count the
    * loss weighting needs and an md5 per view certifying the exact crop
    * bytes. Pure per-row expressions over the token ARRAY (slice, no
    * explode) — a narrow scan at any corpus size.
    */
  val q116 = QuerySpec(
    "q116_contrastive_views",
    (s, d) => {
      def h32(salt: String) = conv(
        substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 8),
        16, 10).cast("long")
      def crop(o: Column, len: Column) =
        md5(concat_ws(" ", slice(col("ts"), (o + lit(1L)).cast("int"), len.cast("int"))))
      Tables.documents(s, d)
        .select(col("doc_id"), split(asciiLower(col("text")), " ").as("ts"))
        .withColumn("n", size(col("ts")).cast("long"))
        .filter(col("n") >= 10)
        .withColumn("len", greatest(lit(5L), expr("n div 2")))
        .withColumn("o1", h32("cv1") % (col("n") - col("len") + 1))
        .withColumn("o2", h32("cv2") % (col("n") - col("len") + 1))
        .select(col("doc_id"), col("n").as("n_tokens"), col("o1"), col("o2"),
          greatest(lit(0L), col("len") - abs(col("o1") - col("o2")))
            .as("overlap_tokens"),
          crop(col("o1"), col("len")).as("v1_md5"),
          crop(col("o2"), col("len")).as("v2_md5"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts,
                CAST(len(string_split(${asciiLowerSql("text")}, ' ')) AS BIGINT) AS n
              FROM documents),
            f AS (
              SELECT doc_id, ts, n, GREATEST(5, n // 2) AS len
              FROM t WHERE n >= 10),
            o AS (
              SELECT doc_id, ts, n, len,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv1'), 1, 8))
                  AS BIGINT) % (n - len + 1) AS o1,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv2'), 1, 8))
                  AS BIGINT) % (n - len + 1) AS o2
              FROM f)
            SELECT doc_id, n AS n_tokens, o1, o2,
              GREATEST(0, len - ABS(o1 - o2)) AS overlap_tokens,
              md5(array_to_string(list_slice(ts, o1 + 1, o1 + len), ' ')) AS v1_md5,
              md5(array_to_string(list_slice(ts, o2 + 1, o2 + len), ' ')) AS v2_md5
            FROM o ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q117
  /** Span-corruption manifest — the T5/UL2 denoising-objective example
    * constructor: mask ~15% of each document's tokens as variable-length
    * spans replaced by `<extra_id_k>` sentinels. Span lengths follow T5's
    * mean-3 Poisson — sampled DETERMINISTICALLY by inverse-CDF over a
    * salted-hash uniform (the q116 idiom: no RNG state, no rejection
    * sampling; 0-length draws fold into 1, lengths truncate at 8, the
    * usual production truncation). Spans are NON-OVERLAPPING by
    * construction: the doc is cut into n_spans equal segments (seg ≥ 20
    * tokens by the 15%/mean-3 arithmetic, so an 8-token span always fits)
    * and each span lands at a salted-hash offset within its segment,
    * clamped to the segment's remaining room. The masked text's md5
    * certifies the exact corrupted bytes, q98/q109's contract.
    *
    * Scale shape: spans explode ×len per span (≈ 0.15 × corpus
    * positions), reassembly aggregates by doc_id with explicit
    * array_sort; per-doc arithmetic is all integer except the u-threshold
    * comparisons, identical double literals on both engines.
    */
  val q117 = QuerySpec(
    "q117_span_corruption",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = Dedup.tokensWithPos(docs)
      val base = docs
        .select(col("doc_id"), size(split(asciiLower(col("text")), " ")).cast("long").as("n"))
        .filter(col("n") >= 20)
        .withColumn("n_spans", greatest(lit(1L), expr("(n * 15 div 100) div 3")))
        .withColumn("seg", expr("n div n_spans"))
      def h32(salt: String) = conv(
        substring(md5(concat(col("doc_id").cast("string"), lit(salt),
          col("k").cast("string"))), 1, 8), 16, 10).cast("long")
      // inverse CDF of Poisson(mean 3) on u ∈ [0,1) from the :len hash;
      // P(0) folds into length 1, tail truncates at 8
      val u = h32(":len") / lit(4294967296.0)
      val poisLen =
        when(u < 0.19914827347145578, 1L)
          .when(u < 0.42319008112684353, 2L)
          .when(u < 0.6472318887822313, 3L)
          .when(u < 0.8152632445237721, 4L)
          .when(u < 0.9160820579686966, 5L)
          .when(u < 0.9664914646911589, 6L)
          .when(u < 0.9880954961436427, 7L)
          .otherwise(lit(8L))
      val spans = base
        .select(col("doc_id"), col("n"), col("n_spans"), col("seg"),
          explode(sequence(lit(0L), col("n_spans") - 1)).as("k"))
        .withColumn("len", least(poisLen, col("seg") - 2))
        .withColumn("start",
          col("k") * col("seg") +
            h32(":sc") % greatest(lit(1L), col("seg") - col("len") + 1))
      val spanStats = spans.groupBy("doc_id").agg(sum("len").as("n_corrupted"))
      val covered = spans
        .select(col("doc_id"), col("k"), col("start"),
          explode(sequence(col("start"), col("start") + col("len") - 1)).as("pos"))
      val rebuilt = toks
        .join(covered.select(col("doc_id"), col("pos"), col("k"),
            (col("pos") === col("start")).as("is_start")),
          Seq("doc_id", "pos"), "left")
        .filter(col("k").isNull || col("is_start"))
        .select(col("doc_id"), col("pos"),
          when(col("is_start"),
            concat(lit("<extra_id_"), col("k").cast("string"), lit(">")))
            .otherwise(col("tok")).as("tok"))
        .groupBy("doc_id")
        .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("masked"))
      base.join(rebuilt, "doc_id").join(spanStats, "doc_id")
        .select(col("doc_id"), col("n").as("n_tokens"), col("n_spans"),
          col("n_corrupted"),
          ffloor(col("n_corrupted").cast("double") / col("n").cast("double"), 4)
            .as("corrupt_frac"),
          md5(col("masked")).as("masked_md5"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts,
                CAST(len(string_split(${asciiLowerSql("text")}, ' ')) AS BIGINT) AS n
              FROM documents),
            base AS (
              SELECT doc_id, ts, n,
                GREATEST(1, (n * 15 // 100) // 3) AS n_spans,
                n // GREATEST(1, (n * 15 // 100) // 3) AS seg
              FROM t WHERE n >= 20),
            lens AS (
              SELECT *, LEAST(CASE
                  WHEN u < 0.19914827347145578 THEN 1
                  WHEN u < 0.42319008112684353 THEN 2
                  WHEN u < 0.6472318887822313 THEN 3
                  WHEN u < 0.8152632445237721 THEN 4
                  WHEN u < 0.9160820579686966 THEN 5
                  WHEN u < 0.9664914646911589 THEN 6
                  WHEN u < 0.9880954961436427 THEN 7
                  ELSE 8 END, seg - 2) AS len
              FROM (
                SELECT *, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':len'
                    || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u
                FROM (SELECT *, unnest(range(0, n_spans)) AS k FROM base))),
            spans AS (
              SELECT doc_id, n, n_spans, seg, k, len,
                k * seg + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sc'
                  || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
                  % GREATEST(1, seg - len + 1) + 1 AS start
              FROM lens),
            span_stats AS (
              SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_corrupted
              FROM spans GROUP BY doc_id),
            covered AS (
              SELECT doc_id, k, start, start + o.o AS pos
              FROM spans CROSS JOIN (SELECT unnest(range(0, 8)) AS o) o
              WHERE o.o < spans.len),
            tp AS (
              SELECT doc_id, i AS pos, ts[i] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM t
                    WHERE n >= 20)),
            rebuilt AS (
              SELECT tp.doc_id,
                string_agg(CASE WHEN c.pos = c.start
                  THEN '<extra_id_' || CAST(c.k AS VARCHAR) || '>'
                  ELSE tp.tok END, ' ' ORDER BY tp.pos) AS masked
              FROM tp LEFT JOIN covered c
                ON tp.doc_id = c.doc_id AND tp.pos = c.pos
              WHERE c.k IS NULL OR c.pos = c.start
              GROUP BY tp.doc_id)
            SELECT b.doc_id, b.n AS n_tokens, b.n_spans,
              s.n_corrupted,
              CAST(FLOOR(CAST(s.n_corrupted AS DOUBLE)
                / CAST(b.n AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0 AS corrupt_frac,
              md5(r.masked) AS masked_md5
            FROM base b JOIN rebuilt r ON b.doc_id = r.doc_id
            JOIN span_stats s ON b.doc_id = s.doc_id
            ORDER BY b.doc_id""")
  )

  // --------------------------------------------------------------- q124
  /** Sliding-window chunk manifest — the RAG/embedding-index chunker:
    * fixed 64-token windows at stride 48 (16-token overlap so no boundary
    * sentence is ever split without a copy). Complements q48's
    * NON-overlapping packer: retrieval wants overlap, packing wants
    * partition. Chunk count and offsets are pure integer arithmetic per
    * doc — ceil((n−size)/stride) interior chunks plus the head — and the
    * md5 certifies each chunk's exact bytes (q116's certificate idiom).
    * Per-row explode of O(n/stride) chunks, no windows, no shuffle except
    * the output sort: the chunker is a map-only operator at any corpus
    * size.
    */
  val q124 = QuerySpec(
    "q124_sliding_chunks",
    (s, d) => {
      val size = 64L
      val stride = 48L
      Tables.documents(s, d)
        .select(col("doc_id"), split(asciiLower(col("text")), " ").as("ts"))
        .withColumn("n", org.apache.spark.sql.functions.size(col("ts")).cast("long"))
        .filter(col("n") >= 1)
        .withColumn("nchunks",
          lit(1L) + when(col("n") > size,
            expr(s"(n - $size + ${stride - 1}) div $stride"))
            .otherwise(lit(0L)).cast("long"))
        .select(col("doc_id"), col("ts"), col("n"),
          explode(sequence(lit(0L), col("nchunks") - 1)).as("chunk_idx"))
        .withColumn("start", col("chunk_idx") * stride)
        .withColumn("len", least(lit(size), col("n") - col("start")))
        .select(col("doc_id"), col("chunk_idx"), col("start"), col("len"),
          md5(concat_ws(" ",
            slice(col("ts"), (col("start") + 1).cast("int"), col("len").cast("int"))))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(s"""WITH t AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts,
                CAST(len(string_split(${asciiLowerSql("text")}, ' ')) AS BIGINT) AS n
              FROM documents),
            b AS (
              SELECT doc_id, ts, n,
                1 + CASE WHEN n > 64 THEN (n - 64 + 47) // 48 ELSE 0 END AS nchunks
              FROM t WHERE n >= 1),
            c AS (
              SELECT doc_id, ts, n, unnest(range(0, nchunks)) AS chunk_idx FROM b)
            SELECT doc_id, chunk_idx, chunk_idx * 48 AS start,
              LEAST(64, n - chunk_idx * 48) AS len,
              md5(array_to_string(
                list_slice(ts, chunk_idx * 48 + 1,
                  chunk_idx * 48 + LEAST(64, n - chunk_idx * 48)), ' ')) AS chunk_md5
            FROM c ORDER BY doc_id, chunk_idx""")
  )

  // --------------------------------------------------------------- q171
  /** CONTENT-DEFINED chunking + chunk-level dedup scorecard — the
    * FastCDC/rsync boundary discipline q48/q124's fixed-size chunkers
    * lack: a boundary is declared AFTER any token whose md5 starts with
    * '0' (rate 1/16 → mean chunk ≈ 16 tokens), so inserting one token
    * near a document's head shifts ONE chunk's boundary instead of every
    * downstream chunk — the property that makes chunk-hash dedup robust
    * to prepended boilerplate, which is how storage dedup and
    * training-data suffix dedup actually run. Chunk ids are a prefix sum
    * of boundary flags over the DOC-LOCAL position window (the
    * shinglesWithPos shuffle shape — keyed by doc_id, bounded per key);
    * chunk bytes are certified by md5 over the position-ordered token run
    * (sort_array over (pos, tok) structs — collect_list alone is
    * order-nondeterministic), and the rollup is one per-source aggregate:
    * chunk volume, distinct chunk hashes, the dup ratio that chunk-level
    * dedup would reclaim, and mean chunk length.
    */
  /** The CDC chunk table (doc_id, source, chunk, n_tok, cmd5) — q171's
    * core, exposed so the shift-robustness property (prepending tokens
    * perturbs exactly one chunk hash) is directly testable. */
  def cdcChunks(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("source"),
        posexplode(split(asciiLower(col("text")), " ")).as(Seq("pos", "tok")))
    val flag = when(substring(md5(col("tok")), 1, 1) === "0", 1L).otherwise(0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk", coalesce(sum(flag).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("source"), col("chunk"))
      .agg(count(lit(1)).as("n_tok"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")))).as("cmd5"))
  }

  val q171 = QuerySpec(
    "q171_cdc_chunks",
    (s, d) => {
      cdcChunks(Tables.documents(s, d)).groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("cmd5")).as("n_distinct_chunks"),
          sum(col("n_tok")).cast("long").as("n_tokens"))
        .select(col("source"), col("n_chunks"), col("n_distinct_chunks"),
          ffloor(lit(1.0) - col("n_distinct_chunks").cast("double") /
            col("n_chunks"), 4).as("dup_chunk_ratio"),
          ffloor(col("n_tokens").cast("double") / col("n_chunks"), 2)
            .as("mean_chunk_tokens"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, source,
                string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents),
            tp AS (
              SELECT doc_id, source, i - 1 AS pos, ts[i] AS tok
              FROM (SELECT doc_id, source, ts,
                      unnest(range(1, len(ts) + 1)) AS i FROM toks)),
            flagged AS (
              SELECT doc_id, source, pos, tok,
                CASE WHEN substr(md5(tok), 1, 1) = '0' THEN 1 ELSE 0 END AS f
              FROM tp),
            cid AS (
              SELECT doc_id, source, pos, tok,
                COALESCE(CAST(SUM(f) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                  0) AS chunk
              FROM flagged),
            chunks AS (
              SELECT doc_id, source, chunk, COUNT(*) AS n_tok,
                md5(string_agg(tok, ' ' ORDER BY pos)) AS cmd5
              FROM cid GROUP BY doc_id, source, chunk),
            roll AS (
              SELECT source, COUNT(*) AS n_chunks,
                COUNT(DISTINCT cmd5) AS n_distinct_chunks,
                CAST(SUM(n_tok) AS BIGINT) AS n_tokens
              FROM chunks GROUP BY source)
            SELECT source, n_chunks, n_distinct_chunks,
              CAST(FLOOR((1.0 - CAST(n_distinct_chunks AS DOUBLE) / n_chunks)
                * 10000.0) AS DOUBLE) / 10000.0 AS dup_chunk_ratio,
              CAST(FLOOR(CAST(n_tokens AS DOUBLE) / n_chunks * 100.0) AS DOUBLE)
                / 100.0 AS mean_chunk_tokens
            FROM roll ORDER BY source""")
  )

  // --------------------------------------------------------------- q229
  /** NEGATIVE-SAMPLING table — the unigram^(3/4) distribution word2vec/
    * contrastive training draws negatives from (Mikolov et al. 2013):
    * raising counts to 0.75 flattens the head so frequent tokens stop
    * dominating the negative pool while the tail still appears. The
    * engineering point is DETERMINISM of a fractional power across
    * engines: c^0.75 = sqrt(sqrt(c·c·c)) — IEEE sqrt is correctly
    * rounded everywhere, unlike pow(x, 0.75) whose libm varies — and
    * each weight is micro-floored to a LONG before summing, so the
    * normalizing total is an EXACT integer sum (a raw double Σ over the
    * vocabulary would be partition-order-dependent). Output: top-50
    * tokens with sampling share vs raw unigram share in micros, the
    * table a trainer ships to its dataloader.
    *
    * Scale shape: one tokenize pass → vocab-bounded count aggregate →
    * narrow per-term weight expression → 1-row exact total broadcast →
    * TakeOrderedAndProject(50).
    */
  val q229 = QuerySpec(
    "q229_negative_sampling",
    (s, d) => {
      val counts = graft.core.Materialize(
        fanOut(Tables.documents(s, d))
          .select(explode(split(asciiLower(col("text")), " ")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("term").agg(count(lit(1)).as("c")))
      // c is cast to double BEFORE cubing: int64 c*c*c silently wraps in
      // Spark past c ≈ 2^21 while DuckDB raises, diverging engines. The
      // double product of three exact integers is IEEE-deterministic in
      // both engines (and exact whenever c^3 < 2^53).
      val cd = col("c").cast("double")
      val weighted = counts.withColumn("w_micro",
        floor(sqrt(sqrt(cd * cd * cd)) * lit(1e6)).cast("long"))
      val tot = weighted.agg(sum("w_micro").cast("long").as("wtot"),
        sum("c").cast("long").as("ctot"))
      weighted.crossJoin(broadcast(tot))
        .select(col("term"), col("c"),
          expr("(w_micro * 1000000) div wtot").as("sample_micro"),
          expr("(c * 1000000) div ctot").as("unigram_micro"))
        .orderBy(col("c").desc, col("term"))
        .limit(50)
    },
    Some(s"""WITH toks AS (
              SELECT t.term FROM documents,
                unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t(term)
              WHERE t.term <> ''),
            counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                       FROM toks GROUP BY 1),
            wt AS (
              SELECT term, c,
                CAST(FLOOR(sqrt(sqrt(
                  CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS w_micro
              FROM counts),
            tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wtot,
                      CAST(SUM(c) AS BIGINT) AS ctot FROM wt)
            SELECT term, c,
              (w_micro * 1000000) // wtot AS sample_micro,
              (c * 1000000) // ctot AS unigram_micro
            FROM wt CROSS JOIN tot
            ORDER BY c DESC, term LIMIT 50""")
  )

  // --------------------------------------------------------------- q230
  /** HILL TAIL-INDEX estimator on document length — does the length
    * distribution have a power-law tail, and how heavy? α̂ =
    * k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the top-k order statistics: the
    * diagnostic that decides whether truncation policy (q70) needs a
    * hard cap (α ≤ 2: infinite variance, a handful of mega-documents
    * dominate token mass) or the tail is benign. Complements q89/q214
    * (Zipf on token frequencies) with the tail exponent of a per-DOC
    * quantity.
    *
    * Exactness: the top-(k+1) lengths arrive by TakeOrdered (corpus
    * never sorts); each ln(x_i/x_k1) = ln(x_i) − ln(x_k1) is floored to
    * micro-nats per ROW (exact-long sum, q137's contract), ONE double
    * division at the end. Ties at the k-th length are cut by doc_id for
    * a deterministic order-statistic set in both engines.
    *
    * Scale shape: scan → TakeOrderedAndProject(k+1) → 51-row window +
    * 1-row aggregate. Nothing after the top-k heap leaves the driver.
    */
  val q230 = QuerySpec(
    "q230_hill_tail_index",
    (s, d) => {
      val k = 50
      val top = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .filter(col("n_chars") > 0)
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(k + 1)
      val kth = top.orderBy(col("n_chars").asc, col("doc_id").desc)
        .limit(1).select(col("n_chars").as("x_k1"))
      top.crossJoin(broadcast(kth))
        .filter(col("n_chars") > col("x_k1"))
        .select(floor((log(col("n_chars").cast("double")) -
          log(col("x_k1").cast("double"))) * lit(1e6)).cast("long")
          .as("ln_micro"))
        .agg(count(lit(1)).as("k_used"),
          sum("ln_micro").cast("long").as("sum_micro"))
        .select(col("k_used"),
          when(coalesce(col("sum_micro"), lit(0L)) === 0, lit(0.0))
            .otherwise(ffloor(col("k_used").cast("double") * lit(1e6) /
              col("sum_micro").cast("double"), 4)).as("alpha_hat"))
    },
    Some(s"""WITH top AS (
              SELECT doc_id, n_chars FROM documents WHERE n_chars > 0
              ORDER BY n_chars DESC, doc_id LIMIT 51),
            kth AS (
              SELECT n_chars AS x_k1 FROM top
              ORDER BY n_chars ASC, doc_id DESC LIMIT 1),
            contrib AS (
              SELECT CAST(FLOOR((ln(CAST(n_chars AS DOUBLE))
                  - ln(CAST(x_k1 AS DOUBLE))) * 1000000.0) AS BIGINT)
                  AS ln_micro
              FROM top CROSS JOIN kth
              WHERE n_chars > x_k1)
            SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
              CASE WHEN COALESCE(SUM(ln_micro), 0) = 0 THEN 0.0
                ELSE CAST(FLOOR(CAST(COUNT(*) AS DOUBLE) * 1000000.0
                  / CAST(SUM(ln_micro) AS DOUBLE) * 10000.0) AS DOUBLE)
                  / 10000.0 END AS alpha_hat
            FROM contrib""")
  )

  // --------------------------------------------------------------- q233
  /** SKIP-GRAM co-occurrence table — [[q229]]'s companion: the positive
    * pairs a word2vec/GloVe-style trainer consumes, with the standard
    * 1/distance window weighting over a ±2 context. Weights are kept as
    * DOUBLED integers (distance 1 → 2, distance 2 → 1) so the aggregate
    * is exact-long arithmetic — no fractional weights to drift. Pairs
    * are unordered (least/greatest on the token pair), matching the
    * symmetric-context convention; [[graft.llmops.CurationOps.q126]]'s
    * PMI can be read directly off this table for GloVe-style shifted-PMI
    * factorization.
    *
    * Scale shape: the context windows ride the SAME per-doc position
    * window every shingle pipeline pays (two lead() offsets, no token
    * array duplication); one (w1, w2)-keyed aggregate, vocab²-bounded
    * and in practice window-sparse; TakeOrderedAndProject(50).
    */
  val q233 = QuerySpec(
    "q233_skipgram_cooc",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val toks = Dedup.tokensWithPos(fanOut(Tables.documents(s, d)))
        .withColumn("t1", lead(col("tok"), 1).over(w))
        .withColumn("t2", lead(col("tok"), 2).over(w))
      val d1 = toks.filter(col("t1").isNotNull)
        .select(least(col("tok"), col("t1")).as("w1"),
          greatest(col("tok"), col("t1")).as("w2"), lit(2L).as("wx2"))
      val d2 = toks.filter(col("t2").isNotNull)
        .select(least(col("tok"), col("t2")).as("w1"),
          greatest(col("tok"), col("t2")).as("w2"), lit(1L).as("wx2"))
      d1.unionByName(d2)
        .groupBy("w1", "w2")
        .agg(sum("wx2").cast("long").as("weight_x2"),
          count(lit(1)).as("n_windows"))
        .orderBy(col("weight_x2").desc, col("w1"), col("w2"))
        .limit(50)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            ctx AS (
              SELECT LEAST(ts[i], ts[i+1]) AS w1,
                GREATEST(ts[i], ts[i+1]) AS w2, 2 AS wx2
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks
                    WHERE len(ts) >= 2)
              UNION ALL
              SELECT LEAST(ts[i], ts[i+2]), GREATEST(ts[i], ts[i+2]), 1
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM toks
                    WHERE len(ts) >= 3))
            SELECT w1, w2, CAST(SUM(wx2) AS BIGINT) AS weight_x2,
              CAST(COUNT(*) AS BIGINT) AS n_windows
            FROM ctx GROUP BY 1, 2
            ORDER BY weight_x2 DESC, w1, w2 LIMIT 50""")
  )

  // --------------------------------------------------------------- q241
  /** AMS F₂ SKETCH audit — the signed estimator completing the md5
    * sketch family (Bloom: membership, CMS: point counts, HLL: distinct,
    * AMS: the SECOND MOMENT Σc² — which is exactly the output size of a
    * term-keyed self-join, i.e. the shuffle-size forecast for every
    * shared-token pair join this engine runs). Four independent sign
    * rows, sign_j(t) = ±1 from the parity of md5 hex digit j, estimator
    * est_j = (Σ_t sign_j(t)·c_t)² — unbiased with variance ≤ 2F₂²
    * (Alon–Matias–Szegedy '96); the audit reports each exact integer
    * est_j alongside their floor-mean and the true F₂, with the
    * relative error in integer micros. Everything is exact
    * DECIMAL(38,0)/HUGEINT — the estimator is integer arithmetic END TO
    * END, which is what makes a SKETCH hash-comparable as VALUES.
    *
    * Scale shape: one tokenize pass → vocab-bounded counts → 4 narrow
    * per-term sign expressions → a 4-row aggregate. The sketch state is
    * 4 longs.
    */
  val q241 = QuerySpec(
    "q241_ams_f2_audit",
    (s, d) => {
      val counts = graft.core.Materialize(
        fanOut(Tables.documents(s, d))
          .select(explode(split(asciiLower(col("text")), " ")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("term").agg(count(lit(1)).as("c")))
      val signed = counts.select(col("c"),
        explode(array((0 until 4).map(j => struct(
          lit(j).as("row_idx"),
          (conv(substring(md5(col("term")), j + 1, 1), 16, 10)
            .cast("long") % 2 * 2 - 1).as("sign"))): _*)).as("p"))
        .select(col("p.row_idx"), (col("p.sign") * col("c")).as("sc"))
        .groupBy("row_idx").agg(sum("sc").cast("long").as("s"))
        .agg(sum((col("s").cast(DecimalType(38, 0)) * col("s")))
          .cast(DecimalType(38, 0)).as("est_sum"),
          count(lit(1)).as("nrows"))
      val exact = counts.agg(
        sum(col("c").cast(DecimalType(38, 0)) * col("c"))
          .cast(DecimalType(38, 0)).as("f2"),
        count(lit(1)).as("n_terms"))
      exact.crossJoin(broadcast(signed))
        .select(col("n_terms"),
          col("f2").cast("long").as("exact_f2"),
          expr("CAST(est_sum div nrows AS BIGINT)").as("est_f2"),
          expr("""CAST((abs(CAST(est_sum div nrows AS DECIMAL(38,0)) - f2)
            * 1000000) div f2 AS BIGINT)""").as("rel_err_micro"))
    },
    Some(s"""WITH toks AS (
              SELECT t.term FROM documents,
                unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t(term)
              WHERE t.term <> ''),
            counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                       FROM toks GROUP BY 1),
            signed AS (
              SELECT j.j AS row_idx,
                CAST(SUM((CAST(('0x' || substr(md5(term), j.j + 1, 1)) AS BIGINT)
                  % 2 * 2 - 1) * c) AS BIGINT) AS s
              FROM counts CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
              GROUP BY 1),
            est AS (
              SELECT CAST(SUM(CAST(s AS HUGEINT) * s) AS HUGEINT) AS est_sum,
                COUNT(*) AS rows_
              FROM signed),
            ex AS (
              SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2,
                CAST(COUNT(*) AS BIGINT) AS n_terms
              FROM counts)
            SELECT n_terms, CAST(f2 AS BIGINT) AS exact_f2,
              CAST(est_sum // rows_ AS BIGINT) AS est_f2,
              CAST((abs(est_sum // rows_ - f2) * 1000000) // f2 AS BIGINT)
                AS rel_err_micro
            FROM ex CROSS JOIN est""")
  )

  val all: Seq[QuerySpec] =
    Seq(q84, q85, q86, q87, q88, q89, q90, q104, q105, q106, q107, q116, q117,
      q124, q171, q229, q230, q233, q241)
}
