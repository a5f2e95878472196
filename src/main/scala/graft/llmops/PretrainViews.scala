package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Ops.{asciiLower, asciiLowerSql, fanOut, ffloor}
import org.apache.spark.sql.types.DecimalType
import PretrainOps._

/** Training-view construction and sampling-statistics side of the
  * pretraining stack, extracted UNCHANGED from `PretrainOps.scala`
  * (round-10 verdict item 4: pure-move split so per-file audit tallies
  * stay meaningful; no logic edits): contrastive views, span
  * corruption, sliding/CDC chunking, negative sampling, Hill tail
  * index, skip-gram co-occurrence, and the AMS F2 audit. Mixture /
  * packing / curriculum / vocabulary queries stay in [[PretrainOps]].
  */
object PretrainViews {
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
      val toks = Dedup.tokensWithPos(Tables.documents(s, d))
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
    Seq(q116, q117, q124, q171, q229, q230, q233, q241)
}
