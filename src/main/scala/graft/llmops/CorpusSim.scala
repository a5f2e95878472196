package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops._
import CorpusPipeline.{hashFrac, normalize, WhitespaceClass}
import CorpusStats._

/** Similarity-candidate quality/cost side of the corpus-stats stack,
  * extracted UNCHANGED from `CorpusStats.scala` (round-10 verdict
  * item 4: pure-move split so per-file audit tallies stay meaningful;
  * no logic edits). Holds the candidate-set audits and alternative
  * candidate-generation strategies measured against the engine defaults:
  * LSH candidate quality, exact cosine range search, NN histogram,
  * prefix-filter (PPJoin-style) join, threshold sweep, sparse cosine
  * join. Profiling/sampling/privacy queries stay in [[CorpusStats]] /
  * [[PrivacyOps]].
  */
object CorpusSim {
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
        // sizes is corpus-cardinality (one row per doc) — must NOT be
        // broadcast at 100 TB; the candidate side is the small one, so let
        // these be keyed shuffles (AQE will pick the join side at runtime).
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
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

  // --------------------------------------------------------------- q147
  /** Similarity join via PREFIX FILTERING (PPJoin's candidate rule).
    * Order every doc's (capped) shingles by global rarity (df asc,
    * shingle asc); a doc with t shingles exposes only its first
    * p = t − ⌈τ·t⌉ + 1 as join keys — any pair with J ≥ τ shares
    * ≥ ⌈τ·t⌉ shingles, so by pigeonhole it MUST collide on a prefix
    * token (no recall loss). Candidates are verified by per-pair
    * `array_intersect` over per-doc sorted shingle arrays (PPJoin's
    * list verify — a pair×shingle re-join was measured 8× worse).
    * Same output as q27 at τ=0.5 — the DuckDB oracle is the FULL
    * shared-shingle algorithm, so the compare proves the lossless-prefix
    * lemma on real data (CorpusStatsSpec additionally asserts prefix
    * candidate volume < full volume and final-pair equality).
    *
    * MEASURED HONESTLY (STATUS.md round 5): on THIS corpus the plain
    * shared-shingle join (q27) wins at both sf0.1 (1.4s vs 7s warm) and
    * 10× (23s vs 80s; was 98s with a row_number prefix window, 450+s
    * with a pair×shingle verify re-join — both replaced) — the synthetic ~30-word vocabulary makes trigram
    * df nearly uniform, so the rarity prefix prunes little while its
    * df-join + per-doc rank window cost is paid in full. Prefix
    * filtering earns its keep on real corpora with Zipfian vocabularies
    * and longer documents (large t ⇒ τ·t prunes most of the posting
    * list); q27 remains this engine's default, and this operator is the
    * verified implementation to reach for when the data is in that
    * regime — not a claimed win here. The regime claim is itself
    * TESTED, not asserted: CorpusStatsSpec's deterministic Zipfian
    * fixture (cube-mapped 400-term vocabulary, heavy head / rare tail)
    * measures a 282× candidate-PAIR prune (63 vs 17,788) with the
    * emitted pairs still exactly equal to the full join's.
    */
  val q147 = QuerySpec(
    "q147_prefix_filter_join",
    (s, d) => {
      val tau = 0.5
      val bg = graft.core.Materialize(graft.operators.Ops.capKeyFreq(
        Dedup.shingles(Tables.documents(s, d), 3), Dedup.MaxShingleDocFreq,
        col("shingle")))
      val df = bg.groupBy("shingle").agg(count(lit(1)).as("df"))
      // ONE per-doc aggregate yields both the rarity-ordered prefix (array
      // slice — replaces a 4.7M-row row_number window, which was the
      // dominant cost of the first cut) and the shingle array the verify
      // intersects. Struct sort_array orders by (df, shingle) — the global
      // total order the prefix lemma needs.
      // (Round-16 decomposition of the round-15 reverted experiment,
      // verdict item 2: the r15 attempt bundled a window-df rewrite AND
      // Materialize(lists) and was reverted wholesale on a noisy ~10s
      // reading. Measured SEPARATELY this round in adjacent TimeQ
      // windows: Materialize(lists) alone reads 9.95/11.93 s warm vs
      // 5.58/5.75 s for this join form — the checkpoint of the per-doc
      // ARRAY table (corpus-wide shingle arrays serialized to block
      // storage, then read back by all three consumers) costs more than
      // re-running the codegen'd df-join + collect_list aggregate per
      // consumer. Both halves of the r15 bundle are now individually
      // measured negative; the join form stands.)
      val lists = bg.join(df, "shingle")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
          .as("sdf"), count(lit(1)).cast("int").as("nbg"))
        .select(col("doc_id"),
          transform(col("sdf"), s => s.getField("shingle")).as("arr"),
          col("nbg"),
          // p = t - ceil(tau*t) + 1; for tau=0.5, ceil(t/2) = (t+1) div 2
          (col("nbg") - floor((col("nbg") + lit(1)) / lit(2)).cast("int")
            + lit(1)).as("p"))
      val prefix = lists
        .select(col("doc_id"),
          explode(slice(col("arr"), lit(1), col("p"))).as("shingle"))
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      // PPJoin-style verify: carry each doc's shingle array into the pair
      // row and intersect in-expression (codegen'd array_intersect) — two
      // keyed joins of the candidate set against the doc-bounded array
      // table, NO per-shingle re-explode (a pair×shingle join re-shuffles
      // candidates×avg-shingles rows — measured 8× the full join's cost at
      // 10× duplication before this restructure).
      val inter = size(array_intersect(col("arr1"), col("arr2")))
      val jac = ffloor(
        inter.cast("double") / (col("n1") + col("n2") - inter), 4)
      cand
        .join(lists.select(col("doc_id").as("d1"), col("arr").as("arr1"),
          col("nbg").as("n1")), "d1")
        .join(lists.select(col("doc_id").as("d2"), col("arr").as("arr2"),
          col("nbg").as("n2")), "d2")
        .select(col("d1"), col("d2"), jac.as("jaccard"))
        .filter(col("jaccard") >= tau)
        .orderBy("d1", "d2")
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
            pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
              FROM trigrams a JOIN trigrams b
                ON a.bg = b.bg AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT d1, d2,
              CAST(FLOOR(CAST(inter AS DOUBLE) / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0 AS jaccard
            FROM pairs
            JOIN sizes s1 ON d1 = s1.doc_id
            JOIN sizes s2 ON d2 = s2.doc_id
            WHERE CAST(FLOOR(CAST(inter AS DOUBLE) / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0 >= 0.5
            ORDER BY d1, d2""")
  )

  // --------------------------------------------------------------- q184
  /** Candidate-threshold ROC SWEEP — q139's single-threshold audit swept
    * across τ ∈ {0.3, 0.5, 0.7} to expose the precision/recall TRADE-OFF
    * curve a dedup operator tunes against before a multi-PB run. The
    * pair set is computed ONCE (q27's capped shared-shingle join, q139's
    * fingerprint ground truth joined on); the sweep itself is
    * conditional aggregation into one row UNPIVOTED by `stack` — three
    * thresholds cost one pair-table pass, not three.
    */
  val q184 = QuerySpec(
    "q184_candidate_threshold_sweep",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = normalize(docs).select(col("doc_id"), md5(col("text_norm")).as("fp"))
      val bg = graft.core.Materialize(graft.operators.Ops.capKeyFreq(
        Dedup.shingles(docs, 3), Dedup.MaxShingleDocFreq, col("shingle")))
      val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
      val jac = ffloor(
        col("inter").cast("double") / (col("s1.nbg") + col("s2.nbg") - col("inter")), 4)
      val scored = bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), jac.as("jaccard"))
        // the sweep's SMALLEST τ bounds what the fp joins must touch: the
        // sub-0.3 tail of the raw pair table (the overwhelming majority on
        // a shared-vocab corpus) is dead weight for every curve point, so
        // prune it BEFORE shuffling pairs into the two fingerprint joins
        .filter(col("jaccard") >= 0.3)
        .join(fp.select(col("doc_id").as("d1"), col("fp").as("f1")), "d1")
        .join(fp.select(col("doc_id").as("d2"), col("fp").as("f2")), "d2")
        .select(col("jaccard"), (col("f1") === col("f2")).as("is_dup"))
      val nTruth = fp.groupBy("fp").agg(count(lit(1)).as("m"))
        .agg(sum(col("m") * (col("m") - 1) / 2).cast("long").as("n_truth"))
      val sweep = scored.agg(
        count(when(col("jaccard") >= 0.3, 1)).as("c3"),
        count(when(col("jaccard") >= 0.3 && col("is_dup"), 1)).as("h3"),
        count(when(col("jaccard") >= 0.5, 1)).as("c5"),
        count(when(col("jaccard") >= 0.5 && col("is_dup"), 1)).as("h5"),
        count(when(col("jaccard") >= 0.7, 1)).as("c7"),
        count(when(col("jaccard") >= 0.7 && col("is_dup"), 1)).as("h7"))
        .select(expr(
          "stack(3, 0.3D, c3, h3, 0.5D, c5, h5, 0.7D, c7, h7) AS (thr, n_cand, n_hit)"))
      sweep.crossJoin(nTruth)
        .select(col("thr"), col("n_cand"), col("n_truth"), col("n_hit"),
          ffloor(col("n_hit").cast("double") / nullif(col("n_cand"), lit(0L)), 6)
            .as("precision"),
          ffloor(col("n_hit").cast("double") / nullif(col("n_truth"), lit(0L)), 6)
            .as("recall"))
        .orderBy("thr")
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
            fp AS (
              SELECT doc_id, md5(regexp_replace(${asciiLowerSql("text")},
                '$WhitespaceClass', ' ', 'g')) AS fp
              FROM documents),
            scored AS (
              SELECT CAST(FLOOR(CAST(inter AS DOUBLE)
                  / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0
                  AS jaccard,
                fa.fp = fb.fp AS is_dup
              FROM (
                SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
                FROM trigrams a JOIN trigrams b
                  ON a.bg = b.bg AND a.doc_id < b.doc_id
                GROUP BY 1, 2) p
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id
              JOIN fp fa ON d1 = fa.doc_id
              JOIN fp fb ON d2 = fb.doc_id
              WHERE CAST(FLOOR(CAST(inter AS DOUBLE)
                  / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0
                  >= 0.3),
            truth AS (
              SELECT CAST(SUM(m * (m - 1) / 2) AS BIGINT) AS n_truth
              FROM (SELECT COUNT(*) AS m FROM fp GROUP BY fp)),
            sweep AS (
              SELECT t.thr,
                COUNT(CASE WHEN jaccard >= t.thr THEN 1 END) AS n_cand,
                COUNT(CASE WHEN jaccard >= t.thr AND is_dup THEN 1 END) AS n_hit
              FROM scored, (VALUES (CAST(0.3 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                (CAST(0.7 AS DOUBLE))) t(thr)
              GROUP BY t.thr)
            SELECT thr, n_cand, n_truth, n_hit,
              CAST(FLOOR(CAST(n_hit AS DOUBLE) / NULLIF(n_cand, 0) * 1000000.0) AS DOUBLE) / 1000000.0 AS precision,
              CAST(FLOOR(CAST(n_hit AS DOUBLE) / NULLIF(n_truth, 0) * 1000000.0) AS DOUBLE) / 1000000.0 AS recall
            FROM sweep, truth ORDER BY thr""")
  )

  // --------------------------------------------------------------- q193
  /** TF-WEIGHTED COSINE similarity join over 5-gram term vectors — the
    * weighted sibling of q27's set-Jaccard: set measures treat a gram
    * repeated 40× in a template the same as one occurrence, so template
    * families with repeated boilerplate segments and genuinely-similar
    * prose score alike; the tf-weighted inner product separates them.
    * Same inverted-index shape as every candidate op here: pairs exist
    * ONLY via the shared-gram equi-join (df-capped [2,50] — one
    * boilerplate gram can never fan out), the dot product is the
    * gram-keyed pair aggregate, and norms join back per doc. Exact
    * integer tf products; the single sqrt(na·nb) + divide is the one
    * IEEE sequence, identical in both engines, then ffloor'd.
    * Norms are over the SAME capped universe as the dot product (q27's
    * reduced-universe discipline) so the measure is a true cosine there.
    */
  val q193 = QuerySpec(
    "q193_sparse_cosine_join",
    (s, d) => {
      val tf = Dedup.shingles(Tables.documents(s, d), 5, dedup = false)
        .groupBy("doc_id", "shingle").agg(count(lit(1)).as("tf"))
      val keep = tf.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 50)).select("shingle")
      val kept = graft.core.Materialize(tf.join(keep, "shingle"))
      val norms = kept.groupBy("doc_id")
        .agg(sum(col("tf") * col("tf")).as("nrm"))
      kept.as("a")
        .join(kept.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
        .join(norms.select(col("doc_id").as("d1"), col("nrm").as("n1")), "d1")
        .join(norms.select(col("doc_id").as("d2"), col("nrm").as("n2")), "d2")
        .select(col("d1"), col("d2"), col("dot"),
          ffloor(col("dot").cast("double") /
            sqrt(col("n1").cast("double") * col("n2").cast("double")), 4)
            .as("cosine"))
        .filter(col("cosine") >= 0.6)
        .orderBy("d1", "d2")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 5),
            grams AS (
              SELECT doc_id,
                unnest(list_transform(range(1, len(ts) - 3),
                  i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_'
                    || ts[i+3] || '_' || ts[i+4])) AS g
              FROM toks),
            tf AS (SELECT doc_id, g, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
            keep AS (SELECT g FROM tf GROUP BY g
                     HAVING COUNT(*) BETWEEN 2 AND 50),
            kept AS (SELECT t.doc_id, t.g, t.tf FROM tf t JOIN keep USING (g)),
            norms AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nrm
                      FROM kept GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2,
                CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
              FROM kept a JOIN kept b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT d1, d2, dot,
              CAST(FLOOR(CAST(dot AS DOUBLE) /
                sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE))
                * 10000.0) AS DOUBLE) / 10000.0 AS cosine
            FROM pairs
            JOIN norms n1 ON d1 = n1.doc_id
            JOIN norms n2 ON d2 = n2.doc_id
            WHERE CAST(FLOOR(CAST(dot AS DOUBLE) /
                sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE))
                * 10000.0) AS DOUBLE) / 10000.0 >= 0.6
            ORDER BY d1, d2""")
  )

  val all: Seq[QuerySpec] = Seq(q139, q141, q144, q147, q184, q193)
}
