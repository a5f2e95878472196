package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops.{asciiLowerSql, ffloor}

/** Corpus-curation operators added in round 4: sketch-accelerated
  * decontamination, per-document importance resampling, bigram-LM
  * perplexity scoring, a composite quality gate, and embedding-level
  * semantic dedup. Every oracled query keeps the established determinism
  * contract (md5 membership, micro-nat integer surprisal, ffloor output
  * truncation) so DuckDB hash-matches bit-for-bit.
  */
object CurationOps {

  // ---------------------------------------------------------------- q91
  /** Bloom-filter decontamination — the 100 TB twin of q58. q58 broadcasts
    * the full distinct eval 8-gram SET and hash-joins the corpus gram
    * stream against it; at a large benchmark suite that broadcast is GBs
    * and every corpus gram pays a hash-table probe. Here the eval side is
    * compressed to a Bloom filter over `xxhash64(gram)` (sized from the
    * eval gram count @ 1% fpp — KBs here, ~1 MB for a real suite) and
    * the corpus stream is pre-filtered by a codegen-friendly
    * `BloomFilterMightContain` probe BEFORE the exact verify join, so
    * ~99% of clean grams never reach the join. The verify join against
    * the true eval set removes Bloom false positives, which is what makes
    * the result EXACTLY q58's — same oracle SQL, hash-identical output.
    *
    * Scale shape: corpus side still never shuffles (bloom probe is a
    * narrow filter; the verify join stays broadcast); the driver-side
    * `stat.bloomFilter` aggregates only the SMALL eval side. The filter
    * insert and probe are the same sketch-library putLong/mightContainLong
    * pair over the same `xxhash64(shingle)` key, so no hash-scheme
    * mismatch is possible.
    */
  val q91 = QuerySpec(
    "q91_bloom_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val evalGrams = Dedup.shingles(docs.filter(col("doc_id") < 10), 8)
        .select("shingle").distinct()
      // sized from the real eval gram count (one count() on the SMALL side):
      // a fixed 1M-capacity bloom is a 1.2 MB literal that bloats every task
      // binary and plan copy; sizing to the suite keeps it a few KB
      val nEval = evalGrams.count()
      val bloom = evalGrams.select(xxhash64(col("shingle")).as("h"))
        .stat.bloomFilter("h", math.max(nEval, 1L), 0.01)
      val ser = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
      val mightContain: Column = ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(ser)),
          ColumnBridge.expression(xxhash64(col("shingle")))))
      Dedup.shingles(docs.filter(col("doc_id") >= 10), 8)
        .filter(mightContain)
        .join(broadcast(evalGrams), "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared_8grams"))
        .orderBy("doc_id")
    },
    // Identical semantics to q58 (the bloom is a pre-filter whose false
    // positives the verify join removes) -> identical oracle.
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

  // ---------------------------------------------------------------- q92
  /** Per-document importance resampling — the DSIR-flavored step between
    * uniform sampling (q61/q62: one rate per stratum) and training: each
    * document gets its OWN acceptance probability from a cheap observable
    * importance proxy (here length-normalized: long-form documents are
    * upweighted, p = clamp(n_chars/400, 0.05, 1)), and membership is the
    * salted hash-threshold primitive — `hashFrac(doc_id,'isr') <
    * hex(floor(p·2^32))` — so the decision is per-row, deterministic
    * across engines/layouts, and needs no window, sort, or RNG state.
    *
    * Scale shape: scan → narrow per-row predicate → one tiny aggregate.
    * The per-row hex cutoff is integer floor arithmetic on IEEE doubles
    * computed by the identical op sequence in both engines.
    */
  val q92 = QuerySpec(
    "q92_importance_resample",
    (s, d) => {
      val p = greatest(lit(0.05), least(lit(1.0),
        col("n_chars").cast("double") / lit(400.0)))
      val cutoff = when(p >= 1.0, lit("g")).otherwise(
        lower(lpad(hex(floor(p * lit(4294967296.0)).cast("long")), 8, "0")))
      val member = CorpusPipeline.hashFrac(col("doc_id"), "isr") < cutoff
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          count(when(member, 1)).as("n_sampled"),
          sum(when(member, col("n_chars"))).cast("long").as("sampled_chars"))
        .orderBy("source")
    },
    Some("""WITH t AS (
              SELECT source, n_chars,
                GREATEST(CAST(0.05 AS DOUBLE), LEAST(CAST(1.0 AS DOUBLE),
                  CAST(n_chars AS DOUBLE) / 400.0)) AS p,
                substr(md5(CAST(doc_id AS VARCHAR) || ':isr'), 1, 8) AS h
              FROM documents),
            c AS (
              SELECT source, n_chars, h,
                CASE WHEN p >= 1.0 THEN 'g'
                     ELSE printf('%08x', CAST(FLOOR(p * 4294967296.0) AS BIGINT)) END AS cutoff
              FROM t)
            SELECT source, COUNT(*) AS n_total,
              COUNT(CASE WHEN h < cutoff THEN 1 END) AS n_sampled,
              CAST(SUM(CASE WHEN h < cutoff THEN n_chars END) AS BIGINT) AS sampled_chars
            FROM c GROUP BY source ORDER BY source""")
  )

  // ---------------------------------------------------------------- q93
  /** Bigram-LM cross-entropy scoring — the CCNet/KenLM-style perplexity
    * filter one order above q84's unigram surprisal: train add-one-smoothed
    * bigram probabilities ON the corpus (p(w2|w1) = (c12+1)/(c1+V)), score
    * every document by its mean per-bigram cross-entropy. Templated/
    * repetitive documents land in the low tail, rare-token soup in the
    * high tail; production thresholds both.
    *
    * Scale shape: the bigram count table is vocab²-bounded (far below
    * corpus size), the doc→model join rides the bigram aggregate's own
    * (w1,w2) shuffle, and V is a broadcast single-row aggregate. No
    * windows over corpus strata (the lead() window partitions by doc_id —
    * bounded by the longest document, same contract as shingling).
    *
    * Determinism: per-BIGRAM surprisal is truncated to integer micro-nats
    * (q84's contract) so downstream sums/means are integer/IEEE-exact
    * across engines.
    */
  val q93 = QuerySpec(
    "q93_bigram_perplexity",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val pairs = Dedup.tokensWithPos(docs)
        .select(col("doc_id"), col("tok").as("w1"),
          lead(col("tok"), 1).over(w).as("w2"))
        .filter(col("w2").isNotNull)
      val tf = pairs.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
      val c12 = tf.groupBy("w1", "w2").agg(sum("tf").cast("long").as("c12"))
      val c1 = tf.groupBy("w1").agg(sum("tf").cast("long").as("c1"))
      val vocab = Dedup.tokensWithPos(docs).agg(countDistinct("tok").as("v"))
      val sMicro = floor(
        log((col("c1").cast("double") + col("v").cast("double")) /
          (col("c12").cast("double") + lit(1.0))) * lit(1e6)).cast("long")
      tf.join(c12, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"), col("tf"), sMicro.as("s_micro"))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("s_micro")).cast("long").as("__total_micro"),
          sum("tf").cast("long").as("n_bigrams"))
        .select(col("doc_id"), col("n_bigrams"),
          ffloor(col("__total_micro").cast("double") / lit(1e6) /
            col("n_bigrams").cast("double"), 4).as("mean_xent"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            pairs AS (
              SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks
                    WHERE len(ts) >= 2)),
            tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM pairs GROUP BY 1, 2, 3),
            c12 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1, 2),
            c1 AS (SELECT w1, CAST(SUM(tf) AS BIGINT) AS c1 FROM tf GROUP BY 1),
            v AS (SELECT COUNT(DISTINCT unnest.t) AS v FROM (
                    SELECT unnest(ts) AS t FROM toks) AS unnest),
            s AS (SELECT w1, w2,
                CAST(FLOOR(ln((CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE))
                  / (CAST(c12 AS DOUBLE) + 1.0)) * 1000000.0) AS BIGINT) AS s_micro
              FROM c12 JOIN c1 USING (w1) CROSS JOIN v)
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
              CAST(FLOOR(CAST(SUM(tf * s_micro) AS DOUBLE) / 1000000.0
                / CAST(SUM(tf) AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                AS mean_xent
            FROM tf JOIN s USING (w1, w2)
            GROUP BY doc_id ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q94
  /** Composite quality gate — the Gopher-rules keep/drop pass: each
    * document is tested against four independent rules (token-count band,
    * mean-word-length band, minimum stopword signal) and the per-source
    * report counts every rule's failures plus the surviving docs. The
    * per-rule counts are what dataset governance actually reads — "why did
    * source X lose 40%?" — not just the keep rate.
    *
    * Scale shape: pure per-row expression work over one scan + one keyed
    * aggregate; all thresholds are constants (in production a broadcast
    * config table). Rule arithmetic is integer counts and one ffloor'd
    * ratio — deterministic across engines.
    */
  val q94 = QuerySpec(
    "q94_quality_gate",
    (s, d) => {
      val ts = split(graft.operators.Ops.asciiLower(col("text")), " ")
      val nTok = size(ts)
      val sumLen = length(array_join(ts, ""))
      val meanWl = ffloor(sumLen.cast("double") / nTok.cast("double"), 4)
      val stopRatio = ffloor(
        size(filter(ts, t => t.isin("the", "a"))).cast("double") /
          nTok.cast("double"), 4)
      val fShort = nTok < 20
      val fLong = nTok > 90
      val fWordlen = meanWl < 4.3 || meanWl > 4.8
      val fStop = stopRatio < 0.005
      Tables.documents(s, d)
        .select(col("source"), fShort.as("f_short"), fLong.as("f_long"),
          fWordlen.as("f_wordlen"), fStop.as("f_stop"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(!col("f_short") && !col("f_long") &&
            !col("f_wordlen") && !col("f_stop"), 1)).as("n_kept"),
          count(when(col("f_short"), 1)).as("n_short"),
          count(when(col("f_long"), 1)).as("n_long"),
          count(when(col("f_wordlen"), 1)).as("n_wordlen"),
          count(when(col("f_stop"), 1)).as("n_stop"))
        .orderBy("source")
    },
    Some(s"""WITH t AS (
              SELECT source,
                len(string_split(${asciiLowerSql("text")}, ' ')) AS n_tok,
                len(array_to_string(string_split(${asciiLowerSql("text")}, ' '), '')) AS sum_len,
                len(list_filter(string_split(${asciiLowerSql("text")}, ' '),
                  x -> x IN ('the', 'a'))) AS n_stopw
              FROM documents),
            f AS (
              SELECT source,
                n_tok < 20 AS f_short,
                n_tok > 90 AS f_long,
                (CAST(FLOOR(CAST(sum_len AS DOUBLE) / CAST(n_tok AS DOUBLE)
                    * 10000.0) AS DOUBLE) / 10000.0 < 4.3
                 OR CAST(FLOOR(CAST(sum_len AS DOUBLE) / CAST(n_tok AS DOUBLE)
                    * 10000.0) AS DOUBLE) / 10000.0 > 4.8) AS f_wordlen,
                CAST(FLOOR(CAST(n_stopw AS DOUBLE) / CAST(n_tok AS DOUBLE)
                  * 10000.0) AS DOUBLE) / 10000.0 < 0.005 AS f_stop
              FROM t)
            SELECT source, COUNT(*) AS n_docs,
              COUNT(CASE WHEN NOT f_short AND NOT f_long AND NOT f_wordlen
                AND NOT f_stop THEN 1 END) AS n_kept,
              COUNT(CASE WHEN f_short THEN 1 END) AS n_short,
              COUNT(CASE WHEN f_long THEN 1 END) AS n_long,
              COUNT(CASE WHEN f_wordlen THEN 1 END) AS n_wordlen,
              COUNT(CASE WHEN f_stop THEN 1 END) AS n_stop
            FROM f GROUP BY source ORDER BY source""")
  )

  // ---------------------------------------------------------------- q95
  /** Embedding-level semantic dedup (SemDeDup-style): bucket vectors by
    * seeded random-hyperplane signature (q32's machinery), verify
    * candidate pairs with exact cosine, and DROP every vector that has a
    * lower-id near-duplicate — keeping one representative per duplicate
    * neighborhood deterministically (lowest id wins, the same canonical
    * rule as q21/q72). Reported per label so retention skew across classes
    * is visible.
    *
    * Candidate generation is the bucket equi-join — never all-pairs — and
    * the drop set is a broadcast-sized distinct list at any scale where
    * near-dup density is sane (it is bounded by the number of duplicates,
    * not the corpus). Rows-only check (seeded hyperplanes are not
    * SQL-expressible); SemDedupSpec asserts planted-duplicate behavior,
    * determinism, and the keep-one-per-clique invariant on exact clones.
    */
  def semanticDedupReport(vectors: DataFrame, minCos: Double, nBits: Int,
                          auditOnly: Boolean = false): DataFrame = {
    val pairs = Similarity.lshNearDupPairs(vectors, minCos, nBits, auditOnly)
    val drops = pairs.select(col("v2").as("vec_id")).distinct()
    vectors
      .join(drops, Seq("vec_id"), "left_anti")
      .select(col("label"))
      .groupBy("label").agg(count(lit(1)).as("n_kept"))
      .join(vectors.groupBy("label").agg(count(lit(1)).as("n_vecs")), Seq("label"))
      .select(col("label"), col("n_vecs"), col("n_kept"))
      .orderBy("label")
  }

  val q95 = QuerySpec(
    "q95_semantic_dedup",
    (s, d) => semanticDedupReport(Tables.embeddings(s, d), minCos = 0.2, nBits = 8),
    None
  )

  // ---------------------------------------------------------------- q245
  /** Oracled keep-set audit for q95's semantic dedup — q244's
    * degenerate-LSH invariant composed one level up: with nBits = 0 the
    * candidate pairs are ALL pairs (q244 proves that list equals the
    * exact cosine range search), so the SemDeDup drop rule collapses to
    * its pure relational form — drop every vector with ANY lower-id
    * neighbor at cos ≥ τ — and DuckDB replays the whole per-label report.
    * A broken bucket join, drop-set distinct, or anti-join in
    * [[semanticDedupReport]] breaks this row for row; only the hyperplane
    * sign bits stay un-oracled (q32's seeded randomness — its candidate
    * list is audited by q244). Labels whose every vector is dropped
    * vanish from the report (the kept-side inner join); the oracle's
    * HAVING clause mirrors that exactly.
    */
  val q245 = QuerySpec(
    "q245_semantic_dedup_audit",
    (s, d) => semanticDedupReport(Tables.embeddings(s, d), minCos = 0.2, nBits = 0,
      auditOnly = true),
    Some("""WITH e AS (
              SELECT vec_id, embedding,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (x, y) -> x + y)) AS nrm
              FROM embeddings),
            p AS (
              SELECT b.vec_id AS v2,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                  (x, y) -> x + y) AS dot,
                a.nrm AS n1, b.nrm AS n2
              FROM e a JOIN e b ON a.vec_id < b.vec_id),
            drops AS (
              SELECT DISTINCT v2 AS vec_id FROM p
              WHERE CAST(FLOOR(dot / NULLIF(n1 * n2, 0.0) * 10000.0) AS DOUBLE)
                      / 10000.0 >= 0.2)
            SELECT em.label, COUNT(*) AS n_vecs,
              COUNT(CASE WHEN d.vec_id IS NULL THEN 1 END) AS n_kept
            FROM embeddings em LEFT JOIN drops d USING (vec_id)
            GROUP BY em.label
            HAVING COUNT(CASE WHEN d.vec_id IS NULL THEN 1 END) > 0
            ORDER BY em.label""")
  )

  // ------------------------------------------------- decontamination store
  /** Persisted decontamination store — the train-once-query-many form of
    * q91, the shape a production pipeline actually runs: the benchmark
    * suite's 8-gram set is built ONCE (grams parquet for the exact verify +
    * the Bloom prefilter bytes + a meta line), then every ingest batch or
    * corpus sweep probes it without touching the eval corpus again. The
    * decontamination analog of [[IncrementalDedup.buildStore]].
    *
    * Store layout: `grams.parquet` (distinct eval grams — the ground
    * truth), `bloom.bin` (sketch over xxhash64(gram)), `meta.json`
    * (shingle k, capacity, fpp). Bloom bytes go through the Hadoop FS API
    * like every sink artifact, so the store works on any object-store URI.
    */
  object DecontamStore {
    def build(evalDocs: DataFrame, dir: String, k: Int = 8,
              capacity: Option[Long] = None, fpp: Double = 0.01): Unit = {
      val grams = Dedup.shingles(evalDocs, k).select("shingle").distinct()
      grams.write.mode("overwrite").parquet(s"$dir/grams.parquet")
      val spark = evalDocs.sparkSession
      // re-read what was written: one eval-side pass feeds both artifacts.
      // Capacity defaults to the REAL gram count (cheap — it's the eval
      // side): an oversized bloom is a megabyte literal in every probe plan.
      val landed = spark.read.parquet(s"$dir/grams.parquet")
      val cap = capacity.getOrElse(math.max(landed.count(), 1L))
      val bloom = landed
        .select(xxhash64(col("shingle")).as("h"))
        .stat.bloomFilter("h", cap, fpp)
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$dir/bloom.bin")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try bloom.writeTo(out) finally out.close()
      val meta = fs.create(new org.apache.hadoop.fs.Path(s"$dir/meta.json"), true)
      try meta.write(
        s"""{"k":$k,"capacity":$capacity,"fpp":$fpp}""".getBytes("UTF-8"))
      finally meta.close()
    }

    /** The Bloom prefilter as a Column over a `shingle` column. */
    def bloomProbe(spark: org.apache.spark.sql.SparkSession, dir: String,
                   gram: Column): Column = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$dir/bloom.bin")
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
      ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(bytes)),
          ColumnBridge.expression(xxhash64(gram))))
    }

    /** Filter a (micro-)batch of documents against the store: returns the
      * CLEAN rows (no 8-gram shared with the eval set). The streaming
      * ingest form runs this inside `foreachBatch` — the same place the
      * sink layer already does batch-grain work — because shingle assembly
      * uses a doc-local window (unsupported on an unbounded stream) and
      * the verdict is per-document, not per-row-forever. Batch-grain
      * shape: shingle → Bloom prefilter (drops ~all clean grams) → exact
      * semi-join against grams.parquet → distinct contaminated ids →
      * left_anti. The batch is never shuffled except by its own doc_id
      * shingle window; the store side is broadcast.
      */
    def decontaminateBatch(spark: org.apache.spark.sql.SparkSession,
                           dir: String, batch: DataFrame, k: Int = 8): DataFrame = {
      val grams = spark.read.parquet(s"$dir/grams.parquet")
      val contaminated = Dedup.shingles(batch, k)
        .filter(bloomProbe(spark, dir, col("shingle")))
        .join(broadcast(grams), "shingle")
        .select("doc_id").distinct()
      batch.join(contaminated, Seq("doc_id"), "left_anti")
    }
  }

  // ---------------------------------------------------------------- q96
  /** Hard-negative mining for contrastive/retrieval training: for each
    * query vector, the k most cosine-similar vectors with a DIFFERENT
    * label — near-misses that teach a model the decision boundary (the
    * supervised counterpart of q29's neighbor search). Exact scoring over
    * the label-filtered candidate set; deterministic tie-break on vec_id;
    * output truncation via ffloor — bit-exact against DuckDB.
    *
    * SCALE PAIRING: same contract as q29 — the broadcast query side and
    * per-query rank window are the exact/oracle form; at corpus scale the
    * candidate set comes from the ANN path first (IVF q38 / PQ q75 probe,
    * then this exact label-aware rerank over the shortlist).
    */
  val q96 = QuerySpec(
    "q96_hard_negatives",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5).limit(5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          Similarity.norm(col("embedding")).as("qn"), col("label").as("qlabel"))
      val c = e.select(col("vec_id"), col("embedding").as("ce"),
        Similarity.norm(col("embedding")).as("cn"), col("label"))
      val w = Window.partitionBy("qid")
        .orderBy(col("cos_raw").desc_nulls_last, col("vec_id"))
      broadcast(q).join(c, col("label") =!= col("qlabel"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFromParts(
            Similarity.dot(col("qe"), col("ce")), col("qn"), col("cn"))
            .as("cos_raw"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("rn"), col("vec_id"),
          ffloor(col("cos_raw"), 4).as("cos"))
        .orderBy("qid", "rn")
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
                       FROM embeddings WHERE vec_id < 5),
            s AS (
              SELECT qid, vec_id,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(qe) + 1),
                    i -> CAST(qe[i] AS DOUBLE) * CAST(ee[i] AS DOUBLE))),
                  (x, y) -> x + y) AS dot,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(qe) + 1),
                    i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))),
                  (x, y) -> x + y) AS nq,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(ee) + 1),
                    i -> CAST(ee[i] AS DOUBLE) * CAST(ee[i] AS DOUBLE))),
                  (x, y) -> x + y) AS nc
              FROM q, (SELECT vec_id, embedding AS ee, label FROM embeddings)
              WHERE label <> qlabel)
            SELECT qid, rn, vec_id, cos FROM (
              SELECT qid, vec_id,
                CAST(FLOOR(dot / NULLIF(SQRT(nq) * SQRT(nc), 0.0) * 10000.0) AS DOUBLE) / 10000.0 AS cos,
                ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY dot / NULLIF(SQRT(nq) * SQRT(nc), 0.0)
                    DESC NULLS LAST, vec_id) AS rn
              FROM s)
            WHERE rn <= 5 ORDER BY qid, rn""")
  )

  // ---------------------------------------------------------------- q98
  /** Boilerplate STRIPPING — the transform that consumes q68's mined list:
    * every token covered by any occurrence of a corpus-frequent trigram
    * (doc-frequency ≥ minDf, q68's definition) is removed, and the
    * document is reassembled from the surviving tokens in order. Reports
    * per doc the before/after token counts and the md5 of the cleaned
    * text, so the oracle hash certifies the REASSEMBLED BYTES, not just
    * counts.
    *
    * Scale shape: the hot-gram list is vocabulary-scale and df-filtered
    * (boilerplate is by definition few distinct spans) → broadcast; the
    * coverage explode is ×3 on matched positions only; reassembly
    * aggregates per doc_id with an explicit array_sort on (pos, tok) —
    * collect_list order is plan-dependent, the sort makes it
    * deterministic — and the array is bounded by the longest document,
    * the same bound every shingle window here already carries.
    */
  def stripBoilerplate(docs: DataFrame, minDf: Int): DataFrame = {
    // ONE tokenize pass (round 15): toks feeds the before/kept aggregates
    // AND the gram window; grams feeds the hot-gram aggregate AND the
    // coverage join. Before this cut the plan held four independent
    // tokenize subtrees (visible as 4× Generate in the executed plan) —
    // at 100 TB that is four corpus scans for one operator.
    val toks = graft.core.Materialize(Dedup.tokensWithPos(docs))
    val grams = graft.core.Materialize(Dedup.shinglesFromTokens(toks, 3))
    val hot = grams.select("doc_id", "shingle").distinct()
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("shingle")
    // No broadcast hint: the hot-gram set is GRAM-grain — distinct
    // 3-grams with df ≥ minDf grow with the corpus (Heaps' law), exactly
    // the vocab-shaped domain the round-9 hint gate exists to keep off
    // the driver. Stats broadcast it while it is small and shuffle when
    // it is not.
    val covered = grams.join(hot, "shingle")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(2))).as("pos"))
      .distinct()
    val before = toks.groupBy("doc_id").agg(count(lit(1)).as("n_before"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_after"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("clean_text"))
    before.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
      .orderBy("doc_id")
  }

  val q98 = QuerySpec(
    "q98_boilerplate_strip",
    (s, d) => stripBoilerplate(Tables.documents(s, d), minDf = 5),
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            tp AS (
              SELECT doc_id, i AS pos, ts[i] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM toks)),
            grams AS (
              SELECT doc_id, i AS pos,
                ts[i] || '_' || ts[i+1] || '_' || ts[i+2] AS g
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM toks
                    WHERE len(ts) >= 3)),
            hot AS (
              SELECT g FROM (
                SELECT g, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, g FROM grams)
                GROUP BY g) WHERE df >= 5),
            covered AS (
              SELECT DISTINCT doc_id, grams.pos + o.o AS pos
              FROM grams JOIN hot USING (g)
              CROSS JOIN (SELECT unnest(range(0, 3)) AS o) o),
            before_t AS (SELECT doc_id, COUNT(*) AS n_before FROM tp GROUP BY doc_id),
            kept AS (
              SELECT tp.doc_id, COUNT(*) AS n_after,
                string_agg(tp.tok, ' ' ORDER BY tp.pos) AS clean_text
              FROM tp ANTI JOIN covered
                ON tp.doc_id = covered.doc_id AND tp.pos = covered.pos
              GROUP BY tp.doc_id)
            SELECT b.doc_id, b.n_before,
              CAST(COALESCE(k.n_after, 0) AS BIGINT) AS n_after,
              md5(COALESCE(k.clean_text, '')) AS clean_md5
            FROM before_t b LEFT JOIN kept k USING (doc_id)
            ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q109
  /** SPAN-LEVEL decontamination — q58/q91 DETECT contaminated documents
    * and the blunt remedy drops them whole; production pipelines (code
    * and long-document corpora especially) instead excise just the
    * leaked spans and keep the rest of the document. Every token covered
    * by an occurrence of an eval-set 8-gram is removed (q98's coverage
    * machinery pointed at q58's eval grams), the document is reassembled
    * in order, and the md5 of the rebuilt text certifies the exact bytes.
    * Only affected documents are emitted — output is bounded by
    * contamination, not corpus.
    *
    * Scale shape: eval grams broadcast (same side q58 broadcasts), the
    * coverage explode is ×8 on MATCHED positions only, reassembly
    * aggregates by doc_id with an explicit array_sort (plan-independent
    * order), and the corpus never shuffles except by doc_id.
    */
  val q109 = QuerySpec(
    "q109_span_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") >= 10)
      val evalGrams = Dedup.shingles(docs.filter(col("doc_id") < 10), 8)
        .select("shingle").distinct()
      val toks = Dedup.tokensWithPos(corpus)
      val grams = Dedup.shinglesWithPos(corpus, 8)
      val covered = grams.join(broadcast(evalGrams), "shingle")
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(7))).as("pos"))
        .distinct()
      val before = toks.groupBy("doc_id").agg(count(lit(1)).as("n_before"))
      val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_after"),
          concat_ws(" ",
            transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
              x => x.getField("tok"))).as("clean_text"))
      before.join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
        .filter(col("n_after") < col("n_before"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            tp AS (
              SELECT doc_id, i AS pos, ts[i] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM toks)
              WHERE doc_id >= 10),
            grams AS (
              SELECT doc_id, i AS pos,
                ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3] || '_'
                  || ts[i+4] || '_' || ts[i+5] || '_' || ts[i+6] || '_' || ts[i+7] AS g
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i FROM toks
                    WHERE len(ts) >= 8)),
            eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
            covered AS (
              SELECT DISTINCT grams.doc_id, grams.pos + o.o AS pos
              FROM grams JOIN eval_grams USING (g)
              CROSS JOIN (SELECT unnest(range(0, 8)) AS o) o
              WHERE grams.doc_id >= 10),
            before_t AS (SELECT doc_id, COUNT(*) AS n_before FROM tp GROUP BY doc_id),
            kept AS (
              SELECT tp.doc_id, COUNT(*) AS n_after,
                string_agg(tp.tok, ' ' ORDER BY tp.pos) AS clean_text
              FROM tp ANTI JOIN covered
                ON tp.doc_id = covered.doc_id AND tp.pos = covered.pos
              GROUP BY tp.doc_id)
            SELECT b.doc_id, b.n_before,
              CAST(COALESCE(k.n_after, 0) AS BIGINT) AS n_after,
              md5(COALESCE(k.clean_text, '')) AS clean_md5
            FROM before_t b LEFT JOIN kept k USING (doc_id)
            WHERE COALESCE(k.n_after, 0) < b.n_before
            ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q99
  /** Deterministic epoch-shuffle shard manifest — the reproducible
    * replacement for "shuffle the corpus each epoch with RNG state":
    * epoch e's order/placement key is `md5(doc_id || ':epoch' || e)`, so
    * every worker (and every re-run, and every engine) derives the SAME
    * epoch permutation from data alone, docs land on `nShards` via the
    * key's hex prefix (uniform, content-addressed), and consecutive
    * epochs are independent permutations (different salt → decorrelated,
    * the q79 domain-separation lesson). Output: per (epoch, shard) doc
    * count and token volume — the manifest a trainer validates against.
    *
    * Scale shape: per-row hash + ONE aggregate per epoch (unioned here for
    * two epochs); no window, no sort of the corpus, no RNG state to
    * distribute. The full sort a naive shuffle implies never happens —
    * shard membership IS the permutation's coarse order, and within-shard
    * order is the hash itself if a reader wants it.
    */
  val q99 = QuerySpec(
    "q99_epoch_shuffle_manifest",
    (s, d) => {
      val nShards = 8
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
      def epochOf(e: Int): DataFrame = {
        // hex prefix → shard: first 8 hex digits mod nShards, computed as
        // conv() in Spark and printf-free integer arithmetic in DuckDB via
        // the LAST hex digit (16 % 8 == 0, so digit-mod is exact for
        // power-of-two shard counts)
        val h = CorpusPipeline.hashFrac(col("doc_id"), s"epoch$e")
        val shard = (conv(substring(h, 8, 1), 16, 10).cast("int") % nShards)
        docs.select(lit(e).as("epoch"), shard.as("shard"), col("n_chars"))
      }
      epochOf(0).unionAll(epochOf(1))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("n_chars"))
        .orderBy("epoch", "shard")
    },
    Some("""WITH k AS (
              SELECT e.epoch,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                  || ':epoch' || CAST(e.epoch AS VARCHAR)), 8, 1)) AS BIGINT) % 8
                  AS shard,
                n_chars
              FROM documents CROSS JOIN (SELECT unnest(range(0, 2)) AS epoch) e)
            SELECT epoch, CAST(shard AS INTEGER) AS shard, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS n_chars
            FROM k GROUP BY epoch, shard ORDER BY epoch, shard""")
  )

  // --------------------------------------------------------------- q100
  /** Per-suite contamination attribution — q58/q91 answer "is this doc
    * contaminated?"; governance needs "BY WHICH benchmark?" before
    * deciding to drop a doc or an eval. Eval docs are grouped into suites
    * (doc_id % 5 here; in production the benchmark name), and each corpus
    * doc reports its shared-8-gram count PER SUITE — the table that
    * distinguishes "one leaked benchmark" from "generally templated text".
    *
    * Scale shape: q58's broadcast join with (gram → suite) instead of
    * (gram), then a (doc, suite) aggregate: the corpus still never
    * shuffles, and the output is bounded by contaminated-docs × suites.
    */
  val q100 = QuerySpec(
    "q100_contamination_by_suite",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val evalGrams = Dedup.shingles(docs.filter(col("doc_id") < 10), 8)
        .select((col("doc_id") % 5).cast("int").as("suite"), col("shingle"))
        .distinct()
      Dedup.shingles(docs.filter(col("doc_id") >= 10), 8)
        .join(broadcast(evalGrams), "shingle")
        .groupBy("doc_id", "suite")
        .agg(count(lit(1)).as("n_shared_8grams"))
        .orderBy("doc_id", "suite")
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
            eval_grams AS (
              SELECT DISTINCT CAST(doc_id % 5 AS INTEGER) AS suite, g
              FROM grams WHERE doc_id < 10)
            SELECT doc_id, suite, COUNT(*) AS n_shared_8grams
            FROM grams JOIN eval_grams USING (g)
            WHERE doc_id >= 10
            GROUP BY doc_id, suite ORDER BY doc_id, suite""")
  )

  // ------------------------------------------------ NB classifier model
  /** The q103 model build, shared by the inline query and [[NBModelStore]]:
    * returns the vocab-bounded (tok, llr_micro) model plus a one-row meta
    * table (np, nn, v, default_llr_micro) where `default_llr_micro` is the
    * smoothed log-odds of a token seen in NEITHER seed —
    * ln((nn+v)/(np+v)) micro-truncated — which is exactly what the
    * in-vocab formula yields at cp=cn=0, so out-of-vocabulary tokens in a
    * future batch score identically to how an unseen token scores at
    * train time (no special case, one coalesce).
    */
  private[llmops] def nbModel(docs: DataFrame, posSource: String,
                              negSource: String): (DataFrame, DataFrame) = {
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(graft.operators.Ops.asciiLower(col("text")), " ")).as("tok"))
    val cp = toks.filter(col("source") === posSource)
      .groupBy("tok").agg(count(lit(1)).as("cp"))
    val cn = toks.filter(col("source") === negSource)
      .groupBy("tok").agg(count(lit(1)).as("cn"))
    val sizes = toks.agg(
      countDistinct("tok").cast("double").as("v"),
      count(when(col("source") === posSource, 1)).cast("double").as("np"),
      count(when(col("source") === negSource, 1)).cast("double").as("nn"))
    val llrMicro = floor(log(
      ((coalesce(col("cp"), lit(0L)).cast("double") + lit(1.0)) * (col("nn") + col("v"))) /
        ((coalesce(col("cn"), lit(0L)).cast("double") + lit(1.0)) * (col("np") + col("v")))
    ) * lit(1e6)).cast("long")
    val model = toks.select("tok").distinct()
      .join(cp, Seq("tok"), "left")
      .join(cn, Seq("tok"), "left")
      .crossJoin(broadcast(sizes))
      .select(col("tok"), llrMicro.as("llr_micro"))
    val meta = sizes.select(col("np"), col("nn"), col("v"),
      floor(log((col("nn") + col("v")) / (col("np") + col("v"))) * lit(1e6))
        .cast("long").as("default_llr_micro"))
    (model, meta)
  }

  /** Score a batch of (doc_id, text) rows against an NB model:
    * per-doc tf → left join model → OOV tokens take the default prior
    * odds → micro-nat sum → length-normalized score. The one scan + one
    * (doc_id, tok) aggregate shape of q103's scoring half.
    *
    * The model join carries NO broadcast hint: the model is TOKEN-grain
    * — its vocabulary grows with the training corpus by Heaps' law, the
    * exact domain class the round-9 hint gate made whitelist-only.
    * Stats broadcast a small model and shuffle a lake-scale one; the
    * equi-join on `tok` is the scalable shape either way.
    */
  private[llmops] def nbScore(batch: DataFrame, model: DataFrame,
                              defaultLlr: Column): DataFrame =
    batch.select(col("doc_id"),
        explode(split(graft.operators.Ops.asciiLower(col("text")), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .join(model, Seq("tok"), "left")
      .select(col("doc_id"), col("tf"),
        coalesce(col("llr_micro"), defaultLlr).as("llr"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("llr")).cast("long").as("__total_micro"),
        sum("tf").cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        ffloor(col("__total_micro").cast("double") / lit(1e6) /
          col("n_tokens").cast("double"), 4).as("nb_logodds"))

  /** Persisted quality-classifier store — the train-once-score-many form
    * of q103 (the [[DecontamStore]] idiom applied to the NB model): the
    * vocab-bounded model table and its meta row are written once; every
    * ingest batch — or streaming micro-batch via `foreachBatch` — scores
    * against the broadcast model without touching the seed corpus again.
    * OOV tokens (absent from the training vocabulary) score the stored
    * prior default, so scoring is total on any future batch.
    */
  object NBModelStore {
    def build(docs: DataFrame, dir: String, posSource: String = "src0",
              negSource: String = "src1"): Unit = {
      val (model, meta) = nbModel(docs, posSource, negSource)
      model.write.mode("overwrite").parquet(s"$dir/model.parquet")
      meta.write.mode("overwrite").parquet(s"$dir/meta.parquet")
    }

    def scoreBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                   batch: DataFrame): DataFrame = {
      val model = spark.read.parquet(s"$dir/model.parquet")
      // one-row meta read at store-open (the bloom.bin idiom, O(1))
      val defaultLlr = spark.read.parquet(s"$dir/meta.parquet")
        .select("default_llr_micro").head.getLong(0)
      nbScore(batch, model, lit(defaultLlr))
    }
  }

  // --------------------------------------------------------------- q103
  /** Naive-Bayes quality classifier — the CCNet/GPT-3-style "does this doc
    * look like the curated seed?" filter, one step past q93's single-LM
    * perplexity: train per-token log-odds from TWO seed sets (positive =
    * src0's docs standing in for the curated corpus, negative = src1's for
    * raw crawl), then score every document by its length-normalized
    * log-odds sum. Add-one smoothing on both classes over the shared
    * corpus vocabulary; tokens unseen in either seed contribute the prior
    * odds ln((Nn+V)/(Np+V)) via coalesce(count, 0) — the same formula, no
    * special case.
    *
    * Scale shape: seed counting scans only the seed slices; the model
    * table is VOCAB-bounded and broadcast to the per-doc tf join, so the
    * corpus is touched by exactly one scan + one (doc_id, tok) aggregate —
    * no corpus-wide shuffle keyed on anything but doc_id. The class
    * totals and V are single-row aggregates (broadcast cross joins).
    *
    * Determinism: per-token-TYPE log-odds truncate to integer micro-nats
    * (q84/q93's contract) before the per-doc sum, so doc scores are
    * integer-arithmetic-exact across engines; the final mean is one
    * ffloor'd division.
    */
  val q103 = QuerySpec(
    "q103_nb_quality_classifier",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (model, _) = nbModel(docs, "src0", "src1")
      // trained on the corpus it scores → every token is in-vocab and the
      // OOV default is unreachable (lit(0) placeholder); batches with
      // genuinely new tokens go through NBModelStore.scoreBatch
      nbScore(docs, model, lit(0L)).orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, source, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            cp AS (SELECT tok, COUNT(*) AS cp FROM toks WHERE source = 'src0' GROUP BY tok),
            cn AS (SELECT tok, COUNT(*) AS cn FROM toks WHERE source = 'src1' GROUP BY tok),
            sizes AS (SELECT
                CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v,
                CAST(COUNT(CASE WHEN source = 'src0' THEN 1 END) AS DOUBLE) AS np,
                CAST(COUNT(CASE WHEN source = 'src1' THEN 1 END) AS DOUBLE) AS nn
              FROM toks),
            model AS (
              SELECT t.tok,
                CAST(FLOOR(ln(
                  ((CAST(COALESCE(cp.cp, 0) AS DOUBLE) + 1.0) * (s.nn + s.v)) /
                  ((CAST(COALESCE(cn.cn, 0) AS DOUBLE) + 1.0) * (s.np + s.v))
                ) * 1000000.0) AS BIGINT) AS llr_micro
              FROM (SELECT DISTINCT tok FROM toks) t
              LEFT JOIN cp ON t.tok = cp.tok
              LEFT JOIN cn ON t.tok = cn.tok
              CROSS JOIN sizes s)
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
              CAST(FLOOR(CAST(SUM(tf * llr_micro) AS DOUBLE) / 1000000.0
                / CAST(SUM(tf) AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                AS nb_logodds
            FROM tf JOIN model USING (tok)
            GROUP BY doc_id ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q110
  /** Distribution-drift monitor (PSI) — the governance check that catches
    * a silently-changed upstream pipeline between corpus snapshots:
    * bucket a cheap observable (doc length, 100-char bands capped at 10
    * buckets — integer arithmetic only), compare the old snapshot's
    * bucket distribution (even doc_ids, q77's split idiom) against the
    * new one's, and report each bucket's Population Stability Index
    * contribution (pA−pB)·ln(pA/pB) with add-one smoothing. Σ > 0.2 is
    * the conventional "investigate" threshold; the per-bucket table says
    * WHERE the mass moved.
    *
    * Determinism: the log argument is a ratio of INTEGER products cast to
    * double — ((cA+1)·(NB+K)) / ((cB+1)·(NA+K)) — and each contribution
    * is floored to integer micro-units before any sum, the q84/q93/q107
    * contract. Scale shape: two scans (or one with conditional
    * aggregation at the cost of a wider row), one 10-row full-outer
    * join, broadcast single-row totals. Nothing shuffles but the bucket
    * aggregate.
    */
  val q110 = QuerySpec(
    "q110_distribution_drift",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bucket = least(expr("n_chars div 100"), lit(9L)).as("bucket")
      val oldB = docs.filter(col("doc_id") % 2 === 0).select(bucket)
        .groupBy("bucket").agg(count(lit(1)).as("n_old"))
      val newB = docs.filter(col("doc_id") % 2 =!= 0).select(bucket)
        .groupBy("bucket").agg(count(lit(1)).as("n_new"))
      val totals = docs.agg(
        count(when(col("doc_id") % 2 === 0, 1)).cast("double").as("na"),
        count(when(col("doc_id") % 2 =!= 0, 1)).cast("double").as("nb"))
      val k = lit(10.0)
      val ca = coalesce(col("n_old"), lit(0L)).cast("double") + lit(1.0)
      val cb = coalesce(col("n_new"), lit(0L)).cast("double") + lit(1.0)
      val pa = ca / (col("na") + k)
      val pb = cb / (col("nb") + k)
      val psiMicro = floor(
        ((pa - pb) * log((ca * (col("nb") + k)) / (cb * (col("na") + k)))) * lit(1e6))
        .cast("long")
      oldB.join(newB, Seq("bucket"), "full_outer")
        .crossJoin(broadcast(totals))
        .select(col("bucket"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          ffloor(pa, 4).as("frac_old"),
          ffloor(pb, 4).as("frac_new"),
          psiMicro.as("psi_micro"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (
              SELECT doc_id, LEAST(n_chars // 100, 9) AS bucket FROM documents),
            o AS (SELECT bucket, COUNT(*) AS n_old FROM b
                  WHERE doc_id % 2 = 0 GROUP BY bucket),
            n AS (SELECT bucket, COUNT(*) AS n_new FROM b
                  WHERE doc_id % 2 <> 0 GROUP BY bucket),
            t AS (SELECT
                CAST(COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS DOUBLE) AS na,
                CAST(COUNT(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS DOUBLE) AS nb
              FROM documents),
            j AS (
              SELECT bucket,
                CAST(COALESCE(n_old, 0) AS DOUBLE) + 1.0 AS ca,
                CAST(COALESCE(n_new, 0) AS DOUBLE) + 1.0 AS cb,
                COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new,
                na, nb
              FROM o FULL OUTER JOIN n USING (bucket) CROSS JOIN t)
            SELECT bucket,
              CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
              CAST(FLOOR(ca / (na + 10.0) * 10000.0) AS DOUBLE) / 10000.0 AS frac_old,
              CAST(FLOOR(cb / (nb + 10.0) * 10000.0) AS DOUBLE) / 10000.0 AS frac_new,
              CAST(FLOOR(((ca / (na + 10.0)) - (cb / (nb + 10.0)))
                * ln((ca * (nb + 10.0)) / (cb * (na + 10.0))) * 1000000.0) AS BIGINT)
                AS psi_micro
            FROM j ORDER BY bucket""")
  )

  /** Persisted drift baseline — q110 as a train-once monitor (the
    * NBModelStore/DecontamStore idiom for governance): the reference
    * corpus's bucket counts land once; every ingest batch — or streaming
    * micro-batch via `foreachBatch` — computes its per-bucket PSI
    * contributions against the broadcast baseline with q110's integer-
    * product/micro-unit arithmetic. Σ psi_micro ≥ 0.2·1e6 is the
    * conventional alert threshold a monitoring sink applies.
    */
  object DriftStore {
    private def buckets(docs: DataFrame): DataFrame =
      docs.select(least(expr("n_chars div 100"), lit(9L)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))

    def build(docs: DataFrame, dir: String): Unit =
      buckets(docs).write.mode("overwrite").parquet(s"$dir/buckets.parquet")

    /** (bucket, n_base, n_batch, psi_micro) for one batch vs the stored
      * baseline. Tiny-side work only: the baseline is ≤ 10 rows, the
      * batch contributes one bucket aggregate.
      */
    def psiOfBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                   batch: DataFrame): DataFrame = {
      val base = spark.read.parquet(s"$dir/buckets.parquet")
        .withColumnRenamed("n", "n_base")
      val cur = buckets(batch).withColumnRenamed("n", "n_batch")
      val totals = base.agg(sum("n_base").cast("double").as("na"))
        .crossJoin(cur.agg(sum("n_batch").cast("double").as("nb")))
      val k = lit(10.0)
      val ca = coalesce(col("n_base"), lit(0L)).cast("double") + lit(1.0)
      val cb = coalesce(col("n_batch"), lit(0L)).cast("double") + lit(1.0)
      val pa = ca / (col("na") + k)
      val pb = cb / (col("nb") + k)
      val psiMicro = floor(
        ((pa - pb) * log((ca * (col("nb") + k)) / (cb * (col("na") + k)))) * lit(1e6))
        .cast("long")
      base.join(cur, Seq("bucket"), "full_outer")
        .crossJoin(broadcast(totals))
        .select(col("bucket"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_batch"), lit(0L)).as("n_batch"),
          psiMicro.as("psi_micro"))
        .orderBy("bucket")
    }
  }

  // --------------------------------------------------------------- q180
  /** CALIBRATION curve for the q103 quality classifier — the reliability
    * diagram every production filter needs before its scores become
    * sampling weights: bucket the length-normalized log-odds into fixed-
    * width score bins and compare each bin's OBSERVED positive rate
    * (share of src0 docs among the labeled src0∪src1 universe) against
    * the bin's position. A well-calibrated classifier is monotone here;
    * a broken smoothing constant or a vocab drift shows up as a flat or
    * inverted curve long before downstream quality moves.
    *
    * Scale shape: the model build is q103's (vocab-bounded, broadcast);
    * scoring touches only the LABELED slice; the curve is a ≤ |bins|-row
    * aggregate. Determinism: scores are q103's micro-nat integers ffloor'd
    * at 4 digits, and the bin id is floor(score·100) on that already-
    * truncated double — the same IEEE value in both engines — so bin
    * membership cannot straddle engines.
    */
  val q180 = QuerySpec(
    "q180_nb_calibration",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (model, _) = nbModel(docs, "src0", "src1")
      val labeled = docs.filter(col("source").isin("src0", "src1"))
      nbScore(labeled, model, lit(0L))
        .join(labeled.select(col("doc_id"),
          (col("source") === "src0").as("is_pos")), "doc_id")
        .withColumn("bucket", floor(col("nb_logodds") * lit(100.0)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("is_pos"), 1)).as("n_pos"))
        .select(col("bucket"), col("n_docs"), col("n_pos"),
          ffloor(col("n_pos").cast("double") / col("n_docs"), 4)
            .as("obs_pos_rate"))
        .orderBy("bucket")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, source, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
                   WHERE source IN ('src0', 'src1') GROUP BY 1, 2),
            cp AS (SELECT tok, COUNT(*) AS cp FROM toks WHERE source = 'src0' GROUP BY tok),
            cn AS (SELECT tok, COUNT(*) AS cn FROM toks WHERE source = 'src1' GROUP BY tok),
            sizes AS (SELECT
                CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v,
                CAST(COUNT(CASE WHEN source = 'src0' THEN 1 END) AS DOUBLE) AS np,
                CAST(COUNT(CASE WHEN source = 'src1' THEN 1 END) AS DOUBLE) AS nn
              FROM toks),
            model AS (
              SELECT t.tok,
                CAST(FLOOR(ln(
                  ((CAST(COALESCE(cp.cp, 0) AS DOUBLE) + 1.0) * (s.nn + s.v)) /
                  ((CAST(COALESCE(cn.cn, 0) AS DOUBLE) + 1.0) * (s.np + s.v))
                ) * 1000000.0) AS BIGINT) AS llr_micro
              FROM (SELECT DISTINCT tok FROM toks) t
              LEFT JOIN cp ON t.tok = cp.tok
              LEFT JOIN cn ON t.tok = cn.tok
              CROSS JOIN sizes s),
            scores AS (
              SELECT doc_id,
                CAST(FLOOR(CAST(SUM(tf * llr_micro) AS DOUBLE) / 1000000.0
                  / CAST(SUM(tf) AS DOUBLE) * 10000.0) AS DOUBLE) / 10000.0
                  AS nb_logodds
              FROM tf JOIN model USING (tok) GROUP BY doc_id),
            lab AS (
              SELECT s.doc_id, s.nb_logodds, d.source = 'src0' AS is_pos
              FROM scores s JOIN documents d USING (doc_id))
            SELECT CAST(FLOOR(nb_logodds * 100.0) AS BIGINT) AS bucket,
              COUNT(*) AS n_docs,
              CAST(COUNT(CASE WHEN is_pos THEN 1 END) AS BIGINT) AS n_pos,
              CAST(FLOOR(CAST(COUNT(CASE WHEN is_pos THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS obs_pos_rate
            FROM lab GROUP BY 1 ORDER BY bucket""")
  )

  // --------------------------------------------------------------- q223
  /** Interpolated KNESER–NEY bigram probabilities — the smoothing that
    * actually ships in n-gram LMs, beside [[q93]]'s add-V baseline: the
    * backoff weight of w2 is its CONTINUATION diversity (how many
    * distinct predecessors it follows — "francisco" is frequent but
    * follows only "san", so its unigram backoff must be tiny), which
    * add-V cannot express. With discount D = 3/4:
    *
    *   P(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1,·)/c1) · N1+(·,w2)/B
    *
    * brought to the common denominator 4·c1·B so the numerator
    * max(4·c12−3, 0)·B + 3·N1+(w1,·)·N1+(·,w2) is EXACT integer
    * arithmetic (DECIMAL(38,0)/HUGEINT — N1 products reach vocab², and
    * ·B passes int64 at corpus scale); one final double division,
    * ffloored. The interpolation provably sums to 1 over w2 (Σ N1+(·,w2)
    * = B), so the probabilities need no renormalization pass.
    *
    * Scale shape: every statistic lives on the BIGRAM-TYPE table —
    * c1 and the follower diversity come from ONE groupBy(w1) over c12
    * (the table is already (w1,w2)-distinct, so count(1) IS the type
    * count), predecessor diversity from one groupBy(w2), B from a 1-row
    * aggregate; the corpus is tokenized once. Top-50 compiles to
    * TakeOrderedAndProject.
    */
  val q223 = QuerySpec(
    "q223_kneser_ney_bigram",
    (s, d) => {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val pairs = Dedup.tokensWithPos(Tables.documents(s, d))
        .select(col("doc_id"), col("tok").as("w1"),
          lead(col("tok"), 1).over(w).as("w2"))
        .filter(col("w2").isNotNull)
      // one tokenization pass: every downstream statistic (c1/n1f, n1p, B)
      // derives from the materialized bigram-type table (q165's lesson —
      // without the cut each consumer replays the corpus window)
      val c12 = graft.core.Materialize(
        pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
      val w1s = c12.groupBy("w1").agg(sum("c12").cast("long").as("c1"),
        count(lit(1)).as("n1f"))
      val w2s = c12.groupBy("w2").agg(count(lit(1)).as("n1p"))
      val b = c12.agg(count(lit(1)).as("b"))
      c12.join(w1s, "w1").join(w2s, "w2").crossJoin(broadcast(b))
        .withColumn("num",
          greatest(col("c12") * 4 - 3, lit(0L)).cast(DecimalType(38, 0)) * col("b") +
            (col("n1f") * col("n1p")).cast(DecimalType(38, 0)) * 3)
        .withColumn("den",
          (col("c1").cast(DecimalType(38, 0)) * col("b")) * 4)
        .select(col("w1"), col("w2"), col("c12"),
          ffloor(col("num").cast("double") / col("den").cast("double"), 6)
            .as("p_kn"))
        .orderBy(col("c12").desc, col("w1"), col("w2"))
        .limit(50)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents),
            pairs AS (
              SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks
                    WHERE len(ts) >= 2)),
            c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                    FROM pairs GROUP BY 1, 2),
            w1s AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                      CAST(COUNT(*) AS BIGINT) AS n1f FROM c12 GROUP BY 1),
            w2s AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM c12 GROUP BY 1),
            b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM c12)
            SELECT w1, w2, c12,
              CAST(FLOOR(CAST(CAST(GREATEST(c12 * 4 - 3, 0) AS HUGEINT) * b
                  + CAST(n1f AS HUGEINT) * n1p * 3 AS DOUBLE)
                / CAST(CAST(c1 AS HUGEINT) * b * 4 AS DOUBLE)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS p_kn
            FROM c12 JOIN w1s USING (w1) JOIN w2s USING (w2) CROSS JOIN b
            ORDER BY c12 DESC, w1, w2 LIMIT 50""")
  )

  val all: Seq[QuerySpec] =
    Seq(q91, q92, q93, q94, q95, q96, q98, q99, q100, q103, q109, q110, q180,
      q223, q245)
}
