package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Ops._
import graft.llmops.Dedup._
import graft.llmops.DedupGraph.{connectedComponents, connectedComponentsDelta, kCoreFixpoint}

/** Audit/adjudication side of the dedup stack, extracted UNCHANGED from
  * `Dedup.scala` (round-10 verdict item 4: pure-move split; no logic
  * edits). Holds the oracle-gated recall/accuracy audits of the seeded
  * sketch paths (LSH recall, SimHash recall, containment accuracy,
  * edit-distance verify), the LSH plan/cost adjudicator, and the
  * corpus-level dedup verdict/scorecard/savings rollups. Sketch and
  * candidate machinery stays in [[Dedup]]; cluster machinery in
  * [[DedupGraph]].
  */
object DedupAudit {
  // --------------------------------------------------------------- q168
  /** Oracled invariant audit for q113 (round-5 verdict item 4). q113's own
    * rows can never be hash-compared: its candidate PAIR SET comes from
    * xxhash64-seeded MinHash band collisions, which no ANSI SQL can
    * reproduce — that is the documented reason q113 stays rows-only. What
    * IS cross-engine checkable is (a) the exact containment universe both
    * engines compute identically (q102's capped-trigram join) and (b) the
    * sketch's accuracy CONTRACT as a boolean: every LSH candidate's
    * estimated containment lies within ±0.2 of its exact value (the bound
    * DedupGraphSpec asserts on fixtures). Spark computes est AND exact and
    * evaluates the check in-query; the oracle states the expected
    * invariant (TRUE) plus the independently-computed exact-pair count —
    * so sketch drift, a broken estimator identity, or a candidate with no
    * real overlap all turn this row red at the driver gate.
    */
  val q168 = QuerySpec(
    "q168_containment_sketch_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // Exact side: q102's plan verbatim (capped universe; the cap is
      // non-binding at gate scale so DuckDB's QUALIFY-capped SQL matches).
      val bg = graft.core.Materialize(
        capKeyFreq(shingles(docs, 3), MaxShingleDocFreq, col("shingle")))
      val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
      // exact feeds TWO plan consumers (the pair count and the audit's
      // left join), which re-ran the whole pair join + sizes joins twice
      // — cut it once (round 16, verdict item 6: family-5 sharing INSIDE
      // the exact ground-truth side only; the audited side below stays
      // q113's registry plan verbatim, untouched).
      val exact = graft.core.Materialize(bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"),
          ffloor(col("inter").cast("double") / col("s1.nbg"), 4).as("c12x"),
          ffloor(col("inter").cast("double") / col("s2.nbg"), 4).as("c21x")))
      val nExact = exact
        .filter(greatest(col("c12x"), col("c21x")) >= 0.5)
        .agg(count(lit(1)).as("n_exact_pairs"))
      // Sketch side: audit exactly what q113 ships (same registry entry),
      // left-joined so a candidate with ZERO real overlap still gets
      // checked against exact = 0.
      val audit = q113.run(s, d)
        .join(exact, Seq("d1", "d2"), "left")
        .select(greatest(
          abs(col("est_c_d1_in_d2") - coalesce(col("c12x"), lit(0.0))),
          abs(col("est_c_d2_in_d1") - coalesce(col("c21x"), lit(0.0)))).as("err"))
        .agg((count(lit(1)) > 0).as("sketch_checked"),
          // Vacuously true when q113 yields zero candidates (max over the
          // empty set is NULL): sketch_checked stays the emptiness signal,
          // so a no-candidate corpus doesn't spuriously red the bound.
          coalesce(max(col("err")) <= 0.2, lit(true)).as("sketch_within_bound"))
      audit.crossJoin(nExact)
        .select(col("n_exact_pairs"), col("sketch_checked"),
          col("sketch_within_bound"))
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
              QUALIFY COUNT(*) OVER (PARTITION BY bg) <= $MaxShingleDocFreq),
            sizes AS (SELECT doc_id, COUNT(*) AS nbg FROM trigrams GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
              FROM trigrams a JOIN trigrams b
                ON a.bg = b.bg AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            scored AS (
              SELECT d1, d2,
                CAST(FLOOR(CAST(inter AS DOUBLE) / s1.nbg * 10000.0) AS DOUBLE) / 10000.0 AS c12x,
                CAST(FLOOR(CAST(inter AS DOUBLE) / s2.nbg * 10000.0) AS DOUBLE) / 10000.0 AS c21x
              FROM pairs
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id)
            SELECT (SELECT COUNT(*) FROM scored WHERE GREATEST(c12x, c21x) >= 0.5)
                     AS n_exact_pairs,
                   true AS sketch_checked, true AS sketch_within_bound""")
  )

  // --------------------------------------------------------------- q123
  /** Fused dedup VERDICT — the per-document keep/drop decision record a
    * curation run actually writes, combining the two oracled dedup signals
    * with a priority: byte/head-identical ('exact', q73's head fingerprint,
    * canonical = lowest doc_id sharing the fingerprint) beats near-dup
    * cluster membership ('near', q101's component labels, canonical = the
    * component minimum) beats 'keep'. Every upstream piece is an operator
    * this inventory already oracles — the fusion itself is two left
    * broadcast-able joins and one CASE, so the verdict table costs no more
    * than its inputs. Downstream, `verdict != 'keep'` is the drop list and
    * `canonical` the redirect target (the q72 manifest idiom, per-doc).
    */
  /** The fused per-doc verdict table (doc_id, verdict, canonical) shared by
    * q123 (the per-doc dump) and q128 (the per-source rate scorecard). */
  def dedupVerdict(docs: DataFrame): DataFrame = {
    val fps = CorpusPipeline.normalize(docs)
      .select(col("doc_id"), IncrementalDedup.fingerprint(Some(8)).as("fp"))
    // owner as a WINDOW over the fp partitioning (round 15, the
    // neardupEdgesFromGrams idiom): min(doc_id) over fp is the same
    // per-group minimum the groupBy+join computed, on the one fp shuffle
    // instead of aggregate-then-rejoin (two shuffles of the fingerprint
    // stream at scale; the window's frame is the whole partition, so no
    // sort beyond the partitioning is required).
    val exact = fps
      .withColumn("dup_of",
        min("doc_id").over(Window.partitionBy("fp")))
      .select(col("doc_id"), col("dup_of"))
    val near = connectedComponents(neardupEdges(docs))
    docs.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of") < col("doc_id"), lit("exact"))
          .when(col("cluster") < col("doc_id"), lit("near"))
          .otherwise(lit("keep")).as("verdict"),
        when(col("dup_of") < col("doc_id"), col("dup_of"))
          .when(col("cluster") < col("doc_id"), col("cluster"))
          .otherwise(col("doc_id")).as("canonical"))
  }

  val q123 = QuerySpec(
    "q123_dedup_verdict",
    (s, d) => dedupVerdict(Tables.documents(s, d)).orderBy("doc_id"),
    Some(s"""WITH RECURSIVE $dedupVerdictCtes
            SELECT doc_id, verdict, canonical FROM verdicts
            ORDER BY doc_id""")
  )

  /** Shared oracle CTE chain ending in `verdicts(doc_id, verdict,
    * canonical, source)` — q123/q128's common SQL. */
  private[llmops] lazy val dedupVerdictCtes: String =
    s"""$neardupEdgesCtes,
            reach(id, lbl) AS (
              SELECT src AS id, src AS lbl FROM edges
              UNION
              SELECT e.dst AS id, r.lbl AS lbl
              FROM edges e JOIN reach r ON r.id = e.src),
            cc AS (SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach
                   GROUP BY id),
            norm AS (
              SELECT doc_id,
                md5(array_to_string(
                  string_split(regexp_replace(${asciiLowerSql("text")}, '[ \t\n\r\f]+', ' ', 'g'), ' ')[1:8],
                  ' ')) AS fp
              FROM documents),
            own AS (SELECT fp, MIN(doc_id) AS dup_of FROM norm GROUP BY fp),
            ex AS (SELECT n.doc_id, o.dup_of FROM norm n JOIN own o USING (fp)),
            verdicts AS (
              SELECT d.doc_id,
                CASE WHEN e.dup_of < d.doc_id THEN 'exact'
                     WHEN c.cluster < d.doc_id THEN 'near'
                     ELSE 'keep' END AS verdict,
                CASE WHEN e.dup_of < d.doc_id THEN e.dup_of
                     WHEN c.cluster < d.doc_id THEN c.cluster
                     ELSE d.doc_id END AS canonical,
                d.source
              FROM documents d
              LEFT JOIN ex e ON d.doc_id = e.doc_id
              LEFT JOIN cc c ON d.doc_id = c.doc_id)"""

  // --------------------------------------------------------------- q128
  /** Per-SOURCE duplication scorecard — the governance rollup of q123:
    * for each ingest source, how much of it is exact-duplicate, how much
    * near-duplicate, and the combined dup rate. This is the table that
    * decides source-level crawl/ingest policy (a source running 30%
    * duplicate is a recrawl bug, not data). One keyed aggregate over the
    * verdict table joined to the doc→source map; source cardinality is a
    * report dimension, so the rollup is broadcast-trivial at any scale.
    */
  val q128 = QuerySpec(
    "q128_source_dup_scorecard",
    (s, d) => {
      val docs = Tables.documents(s, d)
      dedupVerdict(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("verdict") === "exact", 1)).as("n_exact"),
          count(when(col("verdict") === "near", 1)).as("n_near"),
          ffloor(count(when(col("verdict") =!= "keep", 1)).cast("double") /
            count(lit(1)), 4).as("dup_rate"))
        .orderBy("source")
    },
    Some(s"""WITH RECURSIVE $dedupVerdictCtes
            SELECT source, COUNT(*) AS n_docs,
              COUNT(CASE WHEN verdict = 'exact' THEN 1 END) AS n_exact,
              COUNT(CASE WHEN verdict = 'near' THEN 1 END) AS n_near,
              CAST(FLOOR(CAST(COUNT(CASE WHEN verdict <> 'keep' THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS dup_rate
            FROM verdicts GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q175
  /** Oracled RECALL audit for the MinHash-LSH pipeline — [[q168]]'s
    * sibling, closing the sketch-audit pair: q168 gates the containment
    * ESTIMATE's accuracy; this gates q30's candidate RECALL against the
    * exact high-similarity truth. Ground truth is q27's capped-trigram
    * exact Jaccard at J ≥ 0.8, where the 16-band×4-row s-curve puts the
    * per-pair miss probability at (1 − 0.8⁴)¹⁶ ≈ 2·10⁻⁴ — and with the
    * fixed seed the outcome is deterministic for given data, so
    * `recall_ok = TRUE` is a stable oracle expectation (verified at both
    * gate SFs and on fuzz corpora; on a NEW corpus the ~2e-4-per-pair
    * miss rate means this audit requires fixtures known to be within
    * the s-curve's high-recall regime — it is a regression gate, not a
    * universal invariant). DuckDB independently recomputes the
    * exact pair count; a missing candidate, a broken band hash, or a
    * signature regression flips the boolean red at the driver gate. The
    * per-doc `sizes` table is corpus-sized (one row per doc), so the
    * joins here are deliberately plain keyed joins — no broadcast
    * hints — matching q139/q168/q184; AQE picks sides at runtime.
    */
  val q175 = QuerySpec(
    "q175_lsh_recall_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bg = graft.core.Materialize(
        capKeyFreq(shingles(docs, 3), MaxShingleDocFreq, col("shingle")))
      val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
      val jac = ffloor(
        col("inter").cast("double") / (col("s1.nbg") + col("s2.nbg") - col("inter")), 4)
      // exactHigh feeds TWO plan consumers (the anti-join and the pair
      // count) — cut the exact ground-truth side once (round 16, verdict
      // item 6); q30's audited registry plan below stays verbatim.
      val exactHigh = graft.core.Materialize(bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.8))
      val cand = q30.run(s, d).select(col("d1"), col("d2"))
      val missed = exactHigh.join(cand, Seq("d1", "d2"), "left_anti")
      exactHigh.agg(count(lit(1)).as("n_exact_pairs_08"))
        .crossJoin(missed.agg((count(lit(1)) === 0).as("recall_ok")))
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
              QUALIFY COUNT(*) OVER (PARTITION BY bg) <= $MaxShingleDocFreq),
            sizes AS (SELECT doc_id, COUNT(*) AS nbg FROM trigrams GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
              FROM trigrams a JOIN trigrams b
                ON a.bg = b.bg AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            hi AS (
              SELECT d1, d2 FROM pairs
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id
              WHERE CAST(FLOOR(CAST(inter AS DOUBLE)
                / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0 >= 0.8)
            SELECT (SELECT COUNT(*) FROM hi) AS n_exact_pairs_08,
                   true AS recall_ok""")
  )

  // --------------------------------------------------------------- q186
  /** Character-level EDIT-DISTANCE VERIFY of the near-dup candidates —
    * the production verify stage that runs after shingle/LSH candidate
    * generation and before cluster collapse: token-gram candidates can
    * pair docs that share phrases yet differ everywhere else, and
    * Levenshtein over a fixed normalized prefix is the cheap
    * character-level confirmation that they really are edit variants.
    *
    * Scale shape: the pair set is the df-capped gram join ([[neardupEdges]]
    * `half` — never all-pairs), texts arrive by TWO keyed joins of that
    * small pair set against the corpus, and the Levenshtein itself is
    * O(P²) per pair with P = 120 a CONSTANT — so verify cost is linear in
    * candidates regardless of document length (full-text edit distance
    * is not a scale-safe primitive; prefix verify is the standard
    * production trade). All-ASCII normalized text keeps both engines'
    * code-point distance identical; `prefix_sim` is ffloor'd IEEE.
    */
  val q186 = QuerySpec(
    "q186_editdist_verify",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val half = neardupEdges(docs).filter(col("src") < col("dst"))
      val pref = CorpusPipeline.normalize(docs)
        .select(col("doc_id"), substring(col("text_norm"), 1, 120).as("p"))
      half
        .join(pref.select(col("doc_id").as("src"), col("p").as("p1")), "src")
        .join(pref.select(col("doc_id").as("dst"), col("p").as("p2")), "dst")
        .select(col("src").as("d1"), col("dst").as("d2"),
          levenshtein(col("p1"), col("p2")).cast("long").as("edist"),
          greatest(length(col("p1")), length(col("p2"))).as("ml"))
        .filter(col("edist") <= 30)
        .select(col("d1"), col("d2"), col("edist"),
          ffloor(lit(1.0) - col("edist").cast("double") /
            nullif(col("ml"), lit(0)).cast("double"), 4).as("prefix_sim"))
        .orderBy("d1", "d2")
    },
    Some(s"""WITH $neardupEdgesCtes,
            norm AS (
              SELECT doc_id,
                substr(regexp_replace(${asciiLowerSql("text")},
                  '${CorpusPipeline.WhitespaceClass}', ' ', 'g'), 1, 120) AS p
              FROM documents)
            SELECT d1, d2, edist,
              CAST(FLOOR((1.0 - CAST(edist AS DOUBLE) /
                CAST(NULLIF(ml, 0) AS DOUBLE)) * 10000.0) AS DOUBLE)
                / 10000.0 AS prefix_sim
            FROM (
              SELECT h.src AS d1, h.dst AS d2,
                CAST(levenshtein(a.p, b.p) AS BIGINT) AS edist,
                GREATEST(len(a.p), len(b.p)) AS ml
              FROM half h
              JOIN norm a ON h.src = a.doc_id
              JOIN norm b ON h.dst = b.doc_id)
            WHERE edist <= 30
            ORDER BY d1, d2""")
  )

  // --------------------------------------------------------------- q197
  /** Oracled RECALL audit for the SIMHASH pipeline — [[q31]]'s
    * driver-checkable twin, completing the sketch-audit family
    * (q168: containment accuracy, q175: MinHash-LSH recall, q195/q196:
    * IVF/PQ recall, this: SimHash recall). Ground truth is q175's exact
    * capped-trigram Jaccard at J ≥ 0.9 — documents that close have
    * near-identical token multisets, so their 64-bit SimHashes differ in
    * few bits. TWO gated invariants, split so each is checked where it
    * is strongest:
    *
    *   - `sketch_ok`: every exact pair's hamming distance (computed
    *     DIRECTLY on the pair set — two keyed joins against the sketch
    *     table, no candidate generation) is ≤ 12. The sketch-quality
    *     regression gate: a broken [[SimHashAgg]] or token hash turns
    *     near-identical docs into far-apart sketches. 12 because SimHash
    *     approximates FREQUENCY-weighted cosine, not set Jaccard — a
    *     trigram-J 0.9756 fixture pair legitimately measures hamming 7
    *     at sf0.001 (typical is ~3); margin documented, corpus-dependent
    *     like q175.
    *   - `recall_ok`: every exact pair that IS within q31's production
    *     threshold (hamming ≤ 6) appears in q31's own [[simhashPairs]]
    *     output. At 8 chunks > 6 flips the pigeonhole guarantee is
    *     unconditional, so this is a UNIVERSAL machinery invariant on
    *     any corpus — a miss can only be a broken chunk split, bucket
    *     join, or hamming filter.
    *
    * An earlier draft instead ran simhashPairs at maxHamming = 12 and
    * gated membership there; pigeonhole at 12 needs 16 chunks of FOUR
    * bits — 16 possible values per chunk — and the bucket join
    * degenerates toward quadratic (measured 78.7s at the 10× stress
    * corpus vs q31's own 6.3s). The split form tests the same two
    * failure surfaces at production bucket geometry; audit cost is
    * q27's exact join + q31 + two tiny joins.
    * DuckDB independently recomputes the exact pair count; joins are
    * plain keyed joins, sizes corpus-sized — q175's exact scale shape.
    */
  val q197 = QuerySpec(
    "q197_simhash_recall_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val bg = graft.core.Materialize(
        capKeyFreq(shingles(docs, 3), MaxShingleDocFreq, col("shingle")))
      val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
      val jac = ffloor(
        col("inter").cast("double") / (col("s1.nbg") + col("s2.nbg") - col("inter")), 4)
      val exactHigh = bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.9)
      val sh = graft.core.Materialize(simhash(docs))
      val withHam = graft.core.Materialize(exactHigh
        .join(sh.select(col("doc_id").as("d1"), col("simhash").as("h1")), "d1")
        .join(sh.select(col("doc_id").as("d2"), col("simhash").as("h2")), "d2")
        .select(col("d1"), col("d2"),
          bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming")))
      val cand = simhashPairs(sh, maxHamming = 6).select(col("d1"), col("d2"))
      val missed = withHam.filter(col("hamming") <= 6)
        .join(cand, Seq("d1", "d2"), "left_anti")
      withHam.agg(count(lit(1)).as("n_exact_pairs_09"),
          coalesce(max("hamming") <= 12, lit(true)).as("sketch_ok"))
        .crossJoin(missed.agg((count(lit(1)) === 0).as("recall_ok")))
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
              QUALIFY COUNT(*) OVER (PARTITION BY bg) <= $MaxShingleDocFreq),
            sizes AS (SELECT doc_id, COUNT(*) AS nbg FROM trigrams GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
              FROM trigrams a JOIN trigrams b
                ON a.bg = b.bg AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            hi AS (
              SELECT d1, d2 FROM pairs
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id
              WHERE CAST(FLOOR(CAST(inter AS DOUBLE)
                / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0 >= 0.9)
            SELECT (SELECT COUNT(*) FROM hi) AS n_exact_pairs_09,
                   true AS sketch_ok,
                   true AS recall_ok""")
  )

  // --------------------------------------------------------------- q242
  /** LSH S-CURVE PLANNER — the design table behind [[q30]]'s 16-band ×
    * 4-row choice, as an oracled operator: candidate probability
    * P(J) = 1 − (1 − J^r)^b for three (b, r) geometries over a Jaccard
    * grid. Pure expression work — no corpus — but cross-engine pow() is
    * libm-dependent, so every power is an EXPLICIT SQUARING CHAIN
    * (j², j⁴, j⁸; x², …, x³²): the identical IEEE multiply sequence in
    * both engines, ffloored to micros. The table shows the contract the
    * recall audits (q175/q197) enforce: at 16×4, J = 0.8 → P ≈ 0.9998,
    * J = 0.3 → P ≈ 0.12 — steep exactly where the dedup threshold sits.
    */
  val q242 = QuerySpec(
    "q242_lsh_plan",
    (s, _) => {
      val grid = for {
        (b, r) <- Seq((8, 8), (16, 4), (32, 2))
        jx <- 5 to 95 by 5
      } yield (b, r, jx)
      import s.implicits._
      val df = grid.toDF("bands", "rws", "jx")
        .withColumn("j", col("jx").cast("double") / lit(100.0))
        .withColumn("j2", col("j") * col("j"))
        .withColumn("j4", col("j2") * col("j2"))
        .withColumn("j8", col("j4") * col("j4"))
        .withColumn("jr", when(col("rws") === 2, col("j2"))
          .when(col("rws") === 4, col("j4")).otherwise(col("j8")))
        .withColumn("x", lit(1.0) - col("jr"))
        .withColumn("x2", col("x") * col("x"))
        .withColumn("x4", col("x2") * col("x2"))
        .withColumn("x8", col("x4") * col("x4"))
        .withColumn("x16", col("x8") * col("x8"))
        .withColumn("x32", col("x16") * col("x16"))
      df.select(col("bands"), col("rws"), col("jx"),
          graft.operators.Ops.ffloor(
            when(col("bands") === 8, lit(1.0) - col("x8"))
              .when(col("bands") === 16, lit(1.0) - col("x16"))
              .otherwise(lit(1.0) - col("x32")), 6).as("p_candidate"))
        .orderBy("bands", "jx")
    },
    Some(s"""WITH grid(bands, rws, jx) AS (VALUES ${
      (for {
        (b, r) <- Seq((8, 8), (16, 4), (32, 2))
        jx <- 5 to 95 by 5
      } yield s"($b, $r, $jx)").mkString(", ")}),
            s1 AS (SELECT bands, rws, jx,
                     CAST(jx AS DOUBLE) / 100.0 AS j FROM grid),
            s2 AS (SELECT *, j * j AS j2 FROM s1),
            s3 AS (SELECT *, j2 * j2 AS j4 FROM s2),
            s4 AS (SELECT *, j4 * j4 AS j8 FROM s3),
            s5 AS (SELECT *, CASE rws WHEN 2 THEN j2 WHEN 4 THEN j4
                             ELSE j8 END AS jr FROM s4),
            s6 AS (SELECT *, 1.0 - jr AS x FROM s5),
            s7 AS (SELECT *, x * x AS x2 FROM s6),
            s8 AS (SELECT *, x2 * x2 AS x4 FROM s7),
            s9 AS (SELECT *, x4 * x4 AS x8 FROM s8),
            sa AS (SELECT *, x8 * x8 AS x16 FROM s9),
            sb AS (SELECT *, x16 * x16 AS x32 FROM sa)
            SELECT bands, rws, jx,
              CAST(FLOOR((CASE bands WHEN 8 THEN 1.0 - x8
                           WHEN 16 THEN 1.0 - x16
                           ELSE 1.0 - x32 END) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS p_candidate
            FROM sb ORDER BY bands, jx""")
  )

  // --------------------------------------------------------------- q243
  /** DEDUP SAVINGS FORECAST — the number that justifies running [[q72]]
    * at all: if every near-dup cluster collapses to its canonical
    * member (longest, lowest-id tiebreak — q72's exact rule), how many
    * documents and characters leave the corpus? One row:
    * total/dropped docs and chars, and the dropped fraction in integer
    * micros — the before/after line of a curation proposal, exact
    * enough to hash.
    *
    * Scale shape: the label table joined to (doc_id, n_chars), ONE
    * cluster-keyed aggregate (sum + the same max-struct argmax q72
    * uses — no rank window), then a 1-row rollup cross-joined to the
    * corpus totals.
    */
  val q243 = QuerySpec(
    "q243_dedup_savings",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val perCluster = neardupLabels(docs)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          sum("n_chars").cast("long").as("chars_all"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("__best"))
        .filter(col("n_members") >= 2)
        .select((col("n_members") - 1).as("n_dropped"),
          (col("chars_all") - col("__best.n_chars")).as("chars_dropped"))
        .agg(coalesce(sum("n_dropped"), lit(0L)).cast("long").as("n_docs_dropped"),
          coalesce(sum("chars_dropped"), lit(0L)).cast("long").as("chars_dropped"))
      docs.agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("chars_total"))
        .crossJoin(broadcast(perCluster))
        .select(col("n_docs"), col("n_docs_dropped"),
          col("chars_total"), col("chars_dropped"),
          expr("(chars_dropped * 1000000) div chars_total").as("pct_chars_micro"))
    },
    Some(s"""WITH $neardupLabelsCtes,
            lab AS (SELECT id AS doc_id, lbl AS cluster FROM l3),
            ranked AS (
              SELECT cluster, doc_id, n_chars,
                ROW_NUMBER() OVER (PARTITION BY cluster
                  ORDER BY n_chars DESC, doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY cluster) AS n_members
              FROM lab JOIN documents USING (doc_id)),
            dropped AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_dropped,
                CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS chars_dropped
              FROM ranked WHERE n_members >= 2 AND rn > 1),
            tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS chars_total
              FROM documents)
            SELECT n_docs, n_docs_dropped, chars_total, chars_dropped,
              (chars_dropped * 1000000) // chars_total AS pct_chars_micro
            FROM tot CROSS JOIN dropped""")
  )

  val all: Seq[QuerySpec] =
    Seq(q123, q128, q168, q175, q186, q197, q242, q243)
}
