package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Ops._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families, in increasing fuzziness:
  *   - exact        (hash groupBy / DISTINCT)                 → q21, oracled
  *   - keyed latest (window row_number=1, latest-wins)        → q22, oracled
  *   - n-gram Jaccard (shared-shingle join, exact overlap)    → q27, oracled
  *   - MinHash+LSH / SimHash (sketch + band-bucket join)      → q30/q31,
  *     rows-only checked (hash-seeded, not ANSI-SQL-expressible)
  *
  * Scale posture (the 100 TB constraint, SURVEY.md §7.4#5): no operator here
  * ever builds an all-pairs candidate set. Near-dup candidates come from
  * equi-joins on shingles/bands/buckets — the shuffle key is the
  * shingle/band hash, map-side distinct runs first, and hot buckets are
  * capped (`maxBucket`) the way production LSH dedup salts/limits skewed
  * bands. Signatures are fixed-width arrays (64×8B) so the sketch state per
  * doc is O(1) regardless of doc length.
  */
object Dedup {

  // ---------------------------------------------------------------- q21
  /** Exact full-row dedup accounting over a column subset: total vs distinct
    * vs duplicate counts. `distinct()` is a hash aggregate — partial
    * (map-side) dedup happens before the shuffle, so at 100 TB the shuffle
    * carries only per-partition-unique rows.
    */
  val q21 = QuerySpec(
    "q21_dedup_exact",
    (s, d) => {
      val e = Tables.events(s, d).select("user_id", "event_type", "value")
      e.agg(count(lit(1)).as("total_rows"))
        .crossJoin(e.distinct().agg(count(lit(1)).as("distinct_rows")))
        .select(
          col("total_rows"), col("distinct_rows"),
          (col("total_rows") - col("distinct_rows")).as("dup_rows"))
    },
    Some("""SELECT t.total_rows, d.distinct_rows,
              t.total_rows - d.distinct_rows AS dup_rows
            FROM (SELECT COUNT(*) AS total_rows FROM events) t,
                 (SELECT COUNT(*) AS distinct_rows FROM
                   (SELECT DISTINCT user_id, event_type, value FROM events)) d""")
  )

  // ---------------------------------------------------------------- q22
  /** Keyed dedup, latest-wins: one surviving row per user_id (max ts,
    * event_id tiebreak), then survivor stats per event_type. The window
    * shuffles once on user_id; at scale this is the standard
    * "latest version of each document" pass.
    */
  val q22 = QuerySpec(
    "q22_dedup_keyed_latest",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_latest"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n_latest,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_value
            FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
              FROM events)
            WHERE rn = 1
            GROUP BY event_type ORDER BY event_type""")
  )

  // ------------------------------------------------------------ shingles
  /** doc_id → (pos, tok) token stream: one codegen'd split + posexplode,
    * no higher-order functions. Pre-shuffle parallelism is input-split
    * grain (many row groups at corpus scale; one file locally) and the
    * per-row work there is a single split, so a thin map side is fine —
    * the k-gram assembly happens after the doc_id shuffle at full width.
    */
  private[llmops] def tokensWithPos(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(asciiLower(col("text")), " ")).as(Seq("pos", "tok")))

  /** (doc_id, pos, shingle): k-gram spans assembled with lead() over the
    * doc-ordered token stream — one shuffle (by doc_id), fully codegen'd.
    *
    * Design note — this REPLACES a repartition + `transform(sequence(...))`
    * span-array build. That shape has a hidden quadratic trap: Catalyst's
    * InferFiltersFromGenerate derives `size(spans) > 0` from the explode
    * and PushDownPredicates carries it below the repartition, where
    * expression substitution inlines the whole interpreted HOF — with the
    * token split re-evaluated inside every element_at — onto the
    * pre-shuffle (single-input-split) side: measured as an 11–14s
    * single-task stage in q27/q30 at sf0.1. With lead() the only Generate
    * child is one split() per document, so the inferred guard is cheap,
    * and no interpreted higher-order function exists in the pipeline.
    *
    * concat_ws SKIPS null arguments, so the filter on the last lead is
    * what keeps trailing windows (< k tokens left) out — without it they
    * would silently shrink to shorter grams instead of dropping. Docs
    * shorter than k tokens drop here too (their first span already lacks
    * a k-th token), preserving the "no spans for short docs" totality the
    * oracle SQL guards with `len(ts) >= k`.
    */
  private[llmops] def shinglesWithPos(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val parts = col("tok") +: (1 until k).map(o => lead(col("tok"), o).over(w))
    tokensWithPos(docs)
      .select(col("doc_id"), col("pos"),
        parts.last.as("last_tok"), concat_ws("_", parts: _*).as("shingle"))
      .filter(col("last_tok").isNotNull)
      .select(col("doc_id"), col("pos"), col("shingle"))
  }

  /** doc_id → exploded k-gram token shingles ("a_b_c"). `dedup = true`
    * gives set semantics (needed for exact Jaccard); MinHash skips the
    * distinct — min() is duplicate-insensitive, and the dedup shuffle of
    * the full shingle stream would be pure waste at corpus scale. When
    * dedup runs it needs NO extra shuffle: the stream is already
    * hash-partitioned by doc_id, which satisfies the (doc_id, shingle)
    * clustering the aggregate asks for.
    */
  def shingles(docs: DataFrame, k: Int, dedup: Boolean = true): DataFrame = {
    val sh = shinglesWithPos(docs, k).select("doc_id", "shingle")
    if (dedup) sh.distinct() else sh
  }

  // ---------------------------------------------------------------- q27
  /** A shingle present in more than this many documents is dropped from the
    * exact-Jaccard universe (on BOTH the intersection and size side, so the
    * measure stays a true Jaccard over the reduced universe). This is the
    * exact-path analog of `maxBucket` in [[minhashPairs]]: without it, one
    * stop-phrase trigram shared by 1% of a 100 TB corpus makes the
    * shared-shingle candidate join quadratic. At test scale no trigram
    * comes near the cap, so results equal the uncapped exact Jaccard (and
    * the DuckDB oracle applies the identical cap).
    */
  val MaxShingleDocFreq = 1000

  /** Exact n-gram (trigram) Jaccard near-dup pairs via shared-shingle
    * equi-join: |A∩B| from a join on the shingle itself, |A|,|B| from
    * per-doc counts. Expressible in ANSI SQL → DuckDB-oracled.
    *
    * Scale notes: k=3 (not 2) is load-bearing — shingle cardinality grows
    * with vocab^k, so buckets stay small and the candidate join stays
    * near-linear (with k=2 on this ~40-word vocab the join explodes ~10×).
    * Hot shingles above [[MaxShingleDocFreq]] are dropped (the window's
    * shuffle key — shingle — is the same as the join key, so the cap rides
    * the partitioning the join needs anyway). The capped shingle set is
    * consumed three times (both join sides + the size agg), so it is
    * materialized ONCE via [[graft.core.Materialize]] (localCheckpoint
    * locally; reliable checkpoint / replicated persist under cluster
    * config — see that object for the failure-tolerance contract).
    *
    * Factored as a reusable table (d1 < d2, jaccard ≥ minJac) because
    * the q248 store-boundary audit joins it as its exact verify stage
    * (its oracle replays the identical SQL with a pair-class predicate).
    */
  private[llmops] def exactTrigramJaccardPairs(docs: DataFrame,
                                               minJac: Double): DataFrame = {
    val bg = graft.core.Materialize(
      capKeyFreq(shingles(docs, 3), MaxShingleDocFreq, col("shingle")))
    val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
    val inter = bg.as("a")
      .join(bg.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    // ffloor, not round: round(double) is not engine-portable (Ops.scala)
    val jac = ffloor(
      col("inter").cast("double") / (col("s1.nbg") + col("s2.nbg") - col("inter")), 4)
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJac)
  }

  val q27 = QuerySpec(
    "q27_ngram_jaccard",
    (s, d) => exactTrigramJaccardPairs(Tables.documents(s, d), 0.1)
      .orderBy("d1", "d2"),
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
            WHERE CAST(FLOOR(CAST(inter AS DOUBLE) / (s1.nbg + s2.nbg - inter) * 10000.0) AS DOUBLE) / 10000.0 >= 0.1
            ORDER BY d1, d2""")
  )

  // --------------------------------------------------------------- q108
  /** Incremental cluster maintenance — the operator a continuously-
    * ingesting pipeline runs when a batch lands: take the ALREADY-
    * CONVERGED labels of the landed corpus (q73/q74's store-split idiom:
    * store = doc_id % 5 ≠ 0, batch = the rest), compute only the
    * BATCH-INCIDENT edges, and merge via the contracted delta fixpoint
    * ([[connectedComponentsDelta]], round-9 verdict item 4). The pair
    * JOIN's probe side and the fixpoint's graph now track the batch;
    * what does NOT shrink — honestly — is the corpus-global df
    * aggregate (the oracle defines the cap over old ∪ new, so one full
    * gram pass is irreducible in this oracle form) and the in-query
    * store rebuild itself (DuckDB cannot read the persisted store, so
    * q108 recomputes `stored` where production loads it — q119). At the
    * bench's fixed 20% batch fraction those two floors dominate and the
    * delta form measures even with the old seeded-fixpoint form
    * (interleaved A/B at sf0.1 and 10×, STATUS round-9 item 4); its win
    * scales with the store/batch asymmetry production actually has.
    * Converges to exactly the full-recompute labels PROVIDED no
    * shingle's df crosses the [2,50] cap between the store corpus and
    * the full corpus (batch occurrences pushing a store-rare gram over
    * 50 leave store–store edges in `stored` that the cold recompute's
    * full-corpus cap excludes — an over-merge inherited unchanged from
    * the pre-delta seeded form, and absent at every tested SF/seed:
    * the oracle hashes would catch a crossing). Within that cap
    * invariant the equality is exact: stored labels are component
    * minima, so the contracted fixpoint's min is the merged
    * component's true minimum (proof at [[connectedComponentsDelta]]).
    * The oracle is therefore q101's recursive CTE verbatim: any
    * incremental shortcut that changed ANY label would hash-mismatch
    * the cold answer.
    */
  val q108 = QuerySpec(
    "q108_incremental_cc",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isBatch = col("doc_id") % 5 === 0
      // ONE tokenize/shingle pass and ONE df aggregate feed both edge
      // builds: the store build needs the STORE-corpus df cap, the delta
      // build the FULL-corpus cap — both fall out of a single
      // count/count-if aggregate, and one materialized keep-join carries
      // both keep flags (two caps, one shuffle, one checkpoint).
      val grams = shingles(graft.operators.Ops.fanOut(docs), 5)
      val caps = grams.groupBy("shingle").agg(
        count(lit(1)).as("__df_full"),
        count(when(!isBatch, lit(1))).as("__df_store"))
      val g2 = graft.core.Materialize(
        grams.join(caps, "shingle")
          .filter(col("__df_full").between(2, 50) ||
            col("__df_store").between(2, 50))
          .select(col("doc_id"), col("shingle"),
            col("__df_full").between(2, 50).as("__keep_full"),
            col("__df_store").between(2, 50).as("__keep_store")))
      val g2s = g2.filter(col("__keep_store") && !isBatch)
      val halfS = g2s.as("a").join(g2s.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .distinct()
      val storeEdges = graft.core.Materialize(
        halfS.union(halfS.select(col("dst").as("src"), col("src").as("dst"))))
      val stored = connectedComponents(storeEdges)
      val g2f = g2.filter(col("__keep_full"))
      val halfD = g2f.filter(isBatch).as("a").join(g2f.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("src"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("dst"))
        .distinct()
      val deltaEdges = graft.core.Materialize(
        halfD.union(halfD.select(col("dst").as("src"), col("src").as("dst"))))
      connectedComponentsDelta(deltaEdges, stored)
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $neardupEdgesCtes,
            reach(id, lbl) AS (
              SELECT src AS id, src AS lbl FROM edges
              UNION
              SELECT e.dst AS id, r.lbl AS lbl
              FROM edges e JOIN reach r ON r.id = e.src)
            SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach
            GROUP BY id ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q102
  /** CONTAINMENT near-dup pairs — the asymmetric companion to q27's
    * Jaccard. Jaccard misses the most common real-corpus duplication mode:
    * a short doc fully CONTAINED in a longer one (truncated crawl, quoted
    * article, doc + appended boilerplate) scores |A|/|B| ≈ small Jaccard
    * but containment(A→B) = |A∩B|/|A| ≈ 1. Broder's containment measure is
    * what suffix/quote dedup actually thresholds on.
    *
    * Same plan skeleton as q27 — the capped shared-shingle equi-join
    * computes |A∩B| once per unordered pair, and BOTH directions fall out
    * of the same row by dividing by either side's size (no second join,
    * no ordered-pair blowup). Keeps every scale property argued at q27:
    * df-capped shingles, one materialized shingle set feeding three
    * consumers, keyed (un-hinted) size joins — `sizes` is one row per
    * document, so it must never carry a broadcast hint (q139's fix; AQE
    * picks the side at runtime).
    */
  val q102 = QuerySpec(
    "q102_shingle_containment",
    (s, d) => {
      val bg = graft.core.Materialize(
        capKeyFreq(shingles(Tables.documents(s, d), 3), MaxShingleDocFreq, col("shingle")))
      val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
      val inter = bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val c12 = ffloor(col("inter").cast("double") / col("s1.nbg"), 4)
      val c21 = ffloor(col("inter").cast("double") / col("s2.nbg"), 4)
      inter
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"),
          c12.as("c_d1_in_d2"), c21.as("c_d2_in_d1"))
        .filter(greatest(col("c_d1_in_d2"), col("c_d2_in_d1")) >= 0.5)
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
              GROUP BY 1, 2),
            scored AS (
              SELECT d1, d2,
                CAST(FLOOR(CAST(inter AS DOUBLE) / s1.nbg * 10000.0) AS DOUBLE) / 10000.0 AS c_d1_in_d2,
                CAST(FLOOR(CAST(inter AS DOUBLE) / s2.nbg * 10000.0) AS DOUBLE) / 10000.0 AS c_d2_in_d1
              FROM pairs
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id)
            SELECT d1, d2, c_d1_in_d2, c_d2_in_d1 FROM scored
            WHERE GREATEST(c_d1_in_d2, c_d2_in_d1) >= 0.5
            ORDER BY d1, d2""")
  )

  // --------------------------------------------------------------- q111
  /** Longest EXACTLY-SHARED token span per document pair — the exact-
    * substring dedup signal (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): two docs sharing a verbatim run of
    * ≥ L tokens is the strongest duplication evidence there is, and it is
    * invisible to whole-doc Jaccard when the shared run is a small part
    * of both docs (q102's containment catches SMALL-in-LARGE; this
    * catches LARGE∩LARGE with a common block — syndicated paragraphs,
    * license headers, quoted articles).
    *
    * A shared span of length s ⟺ s−k+1 consecutive shared k-grams at a
    * constant positional offset, so: join position-stamped 10-grams
    * (df-capped, the q27 candidate discipline), put each match on its
    * DIAGONAL (p1−p2), and find the longest run of consecutive p1 per
    * (pair, diagonal) with the gaps-and-islands grouping p1−row_number —
    * pure window arithmetic, no per-pair quadratic scan. max_run + k − 1
    * is the span length in tokens.
    *
    * Scale shape: everything rides the gram equi-join's shuffle; the
    * islands window partitions by (d1, d2, diag) — bounded by a single
    * shared block's length, never a corpus stratum. Output is bounded by
    * pairs sharing ≥ 15-token runs.
    */
  val q111 = QuerySpec(
    "q111_longest_shared_span",
    (s, d) => {
      val g = graft.core.Materialize(
        capKeyFreq(shinglesWithPos(Tables.documents(s, d), 10),
          MaxShingleDocFreq, col("shingle")))
      val matches = g.as("a").join(g.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
      val wDiag = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
      matches
        .withColumn("grp", col("p1") - row_number().over(wDiag))
        .groupBy("d1", "d2", "diag", "grp")
        .agg(count(lit(1)).as("run"))
        .groupBy("d1", "d2")
        .agg((max("run") + lit(9)).as("max_span_tokens"),
          sum("run").cast("long").as("n_shared_grams"))
        .filter(col("max_span_tokens") >= 15)
        .orderBy("d1", "d2")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 10),
            grams_all AS (
              SELECT doc_id, i AS pos,
                ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3] || '_'
                  || ts[i+4] || '_' || ts[i+5] || '_' || ts[i+6] || '_' || ts[i+7]
                  || '_' || ts[i+8] || '_' || ts[i+9] AS g
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 8)) AS i FROM toks)),
            grams AS (
              SELECT doc_id, pos, g FROM grams_all
              QUALIFY COUNT(*) OVER (PARTITION BY g) <= 1000),
            m AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
                a.pos - b.pos AS diag
              FROM grams a JOIN grams b
                ON a.g = b.g AND a.doc_id < b.doc_id),
            runs AS (
              SELECT d1, d2, diag,
                p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS grp
              FROM m),
            islands AS (
              SELECT d1, d2, COUNT(*) AS run
              FROM runs GROUP BY d1, d2, diag, grp)
            SELECT d1, d2, MAX(run) + 9 AS max_span_tokens,
              CAST(SUM(run) AS BIGINT) AS n_shared_grams
            FROM islands GROUP BY d1, d2
            HAVING MAX(run) + 9 >= 15
            ORDER BY d1, d2""")
  )

  // ------------------------------------------------------------- MinHash
  /** Number of hash functions / LSH bands (16 bands × 4 rows). */
  val NumHashes = 64
  val NumBands = 16
  private val RowsPerBand = NumHashes / NumBands
  val MersennePrime = 2147483647L // 2^31 - 1

  /** Deterministic (a,b) pairs for h_i(x) = (a·x + b) mod p, seeded. */
  val minhashParams: Seq[(Long, Long)] = {
    val r = new scala.util.Random(42)
    Seq.fill(NumHashes)((1L + r.nextInt(Int.MaxValue - 1).toLong,
                         r.nextInt(Int.MaxValue).toLong))
  }

  /** doc_id → 64-long MinHash signature array over k-gram shingles.
    * One shuffle (groupBy doc_id); the signature is one fixed 512-byte
    * sketch buffer per doc via [[graft.functions.MinHashSketchAgg]]
    * (a `TypedImperativeAggregate` — single-pass elementwise-min update,
    * mergeable partials, same values as 64 separate min(pmod(...)) agg
    * columns but without 64× aggregate-column overhead).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3): DataFrame = {
    val sh = shingles(docs, k, dedup = false)
      .select(col("doc_id"), pmod(xxhash64(col("shingle")), lit(MersennePrime)).as("h"))
    sh.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg
        .minhash_sketch(col("h"), minhashParams, MersennePrime).as("sig"))
  }

  /** Candidate pairs whose signatures collide in ≥1 LSH band, with the
    * signature-estimated Jaccard. `maxBucket` drops degenerate hot buckets
    * (skew guard — at 100 TB a stop-shingle band would otherwise produce a
    * quadratic bucket).
    */
  /** (doc_id, sig, band_idx, band_hash) — one row per LSH band of each
    * signature, CARRYING the signature column. The carry matters for
    * streaming consumers: re-attaching the sig later would be a
    * stream-stream self-join (watermark-bound state); carrying it through
    * the explode keeps the pipeline stateless.
    */
  def bandHashesWithSig(sigs: DataFrame): DataFrame =
    sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(NumBands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand))))
      )))
      .toDF("doc_id", "sig", "band_idx", "band_hash")

  /** (doc_id, band_idx, band_hash) — shared by [[minhashPairs]] and the
    * persisted-store incremental path ([[IncrementalDedup]]).
    */
  def bandHashes(sigs: DataFrame): DataFrame =
    bandHashesWithSig(sigs).drop("sig")

  def minhashPairs(sigs: DataFrame, minSim: Double, maxBucket: Int = 1000): DataFrame = {
    val bands = bandHashes(sigs)
    val capped = capKeyFreq(bands, maxBucket, col("band_idx"), col("band_hash"))
    val cand = capped.as("x")
      .join(capped.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val est = cand
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
      .select(col("d1"), col("d2"),
        round(
          graft.functions.VectorFunctions.sig_agreement(col("sig1"), col("sig2"))
            .cast("double") / NumHashes, 4).as("est_jaccard"))
    est.filter(col("est_jaccard") >= minSim).orderBy("d1", "d2")
  }

  /** q30: MinHash-LSH near-dup pairs on documents. Deterministic (fixed
    * seed 42) but hash-based → rows-only driver check, no SQL oracle.
    * Signatures feed the band explode AND both sides of the estimate join;
    * the eager [[graft.core.Materialize]] computes the 64-min aggregation
    * exactly once (localCheckpoint locally; see Materialize for the
    * cluster-mode failure-tolerance contract).
    */
  val q30 = QuerySpec(
    "q30_dedup_minhash_lsh",
    (s, d) => minhashPairs(
      graft.core.Materialize(minhashSignatures(Tables.documents(s, d), k = 3)),
      minSim = 0.3),
    None
  )

  // ------------------------------------------------------------- SimHash
  /** doc_id → 64-bit SimHash over tokens: per bit, sum ±1 weighted by the
    * token hash's bit, sign → bit. One groupBy(doc_id) shuffle; the 64
    * counters live in one [[graft.functions.SimHashSketchAgg]] sketch
    * buffer (same fixed-width-sketch pattern as MinHash — a 64-column
    * sum(when) aggregate spent more time touching 64 generated slots per
    * row than doing the math).
    *
    * The explicit repartition width matters twice: a count-less
    * `repartition(col)` is an AQE-coalescible shuffle that folds the tiny
    * pre-explode doc stream to one partition, and the explode+hash+partial
    * aggregate downstream must run at full width.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions, col("doc_id"))
      .select(col("doc_id"), explode(split(asciiLower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    toks.groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash_sketch(col("h")).as("simhash"))
  }

  /** Near-dup pairs with Hamming distance ≤ maxHamming. Candidates come
    * from exact-chunk collisions; by pigeonhole the chunk count must
    * EXCEED maxHamming for full recall (a pair differing in k bits spread
    * across k distinct chunks shares none of those k chunks), so the
    * smallest divisor-of-64 chunk count > maxHamming is used.
    */
  def simhashPairs(sh: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nChunks = Seq(2, 4, 8, 16, 32, 64).find(_ > maxHamming)
      .getOrElse(throw new IllegalArgumentException(s"maxHamming $maxHamming >= 64"))
    val bits = 64 / nChunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val chunks = sh.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until nChunks).map(c =>
        shiftright(col("simhash"), c * bits).bitwiseAND(mask)): _*)))
      .toDF("doc_id", "simhash", "chunk_idx", "chunk")
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }

  /** q31: SimHash near-dup pairs (rows-only check — hash-based). The
    * sketch table feeds BOTH sides of the chunk-collision self-join;
    * without the eager materialization the whole tokenize+sketch pipeline
    * executes twice (visible as two full ObjectHashAggregate branches in
    * the plan).
    */
  val q31 = QuerySpec(
    "q31_dedup_simhash",
    (s, d) => simhashPairs(
      graft.core.Materialize(simhash(Tables.documents(s, d))), maxHamming = 6),
    None
  )

  // ---------------------------------------------------------------- q68
  /** Boilerplate n-gram mining: the corpus-wide repeated-span list — every
    * token trigram appearing in ≥ `minDf` DISTINCT documents, ranked by
    * document frequency. This is the list a boilerplate-stripping pass
    * consumes (repeated headers/footers/license blurbs), and the exact
    * corpus-level complement of q27/q30's pairwise near-dup: one
    * shingle stream, one count aggregate, no joins at all.
    *
    * 100 TB shape: explode → map-side partial counts → one shuffle keyed
    * by shingle (vocabulary-sized, not corpus-sized after partials) →
    * HAVING + global top-k of the already-tiny survivor set. The same
    * plan q23 runs for unigrams.
    */
  val q68 = QuerySpec(
    "q68_boilerplate_ngrams",
    (s, d) =>
      Dedup.shingles(fanOut(Tables.documents(s, d)), 3)
        .groupBy("shingle")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 5)
        .orderBy(col("df").desc, col("shingle"))
        .limit(100),
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 3),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2])) AS g
                FROM toks))
            SELECT g AS shingle, COUNT(*) AS df
            FROM grams GROUP BY g HAVING COUNT(*) >= 5
            ORDER BY df DESC, shingle LIMIT 100""")
  )

  // ---------------------------------------------------------------- q69
  /** Near-dup CLUSTER SEEDING: pairs are not what a dedup pipeline keeps —
    * it keeps one representative per CLUSTER. This operator turns a
    * candidate edge list (docs sharing a rare 5-gram, boilerplate-capped
    * like every candidate join here) into cluster labels via K=3 rounds of
    * min-label propagation: label_{k+1}(d) = min over {d} ∪ neighbors of
    * label_k. Each round is ONE keyed join + aggregate over the label
    * table — and the label table holds only docs with ≥1 candidate edge
    * (the overwhelming majority of a real corpus is edge-free and never
    * enters the loop).
    *
    * Bounded K is the deliberate contract: both engines compute exactly
    * K rounds (the oracle unrolls the same three), so the check is exact,
    * and K bounds the 100 TB cost to K shuffles of the edge-endpoint set.
    * Dedup clusters are shallow (near-dups of a doc are near-dups of each
    * other); chains longer than K hops get split labels — production runs
    * the same loop to a fixpoint (or large-star/small-star) when true CC
    * is required.
    */
  /** SYMMETRIC candidate edge list (src, dst) — docs sharing a rare
    * 5-gram (df capped to [2,50] so boilerplate grams never fan out).
    * Shared by q69/q72 (bounded-K labels) and q101 (fixpoint CC); both
    * directions present so one join step propagates along every edge.
    */
  def neardupEdges(docs: DataFrame): DataFrame =
    neardupEdgesFromGrams(shingles(fanOut(docs), 5))

  /** [[neardupEdges]] from a pre-built (doc_id, shingle) table. Exists to
    * keep [[neardupEdges]]' contract (cap → keep-join → ordered pair join
    * → symmetrize) factored from the gram SOURCE, so a caller with its own
    * tokenize pass can reuse the edge construction. q108 does NOT route
    * through it: its dual-cap form needs store- and full-corpus keep flags
    * off one shared df aggregate, which this single-cap shape cannot
    * express, so it inlines the same skeleton with two caps.
    */
  private[llmops] def neardupEdgesFromGrams(grams: DataFrame): DataFrame = {
    val keep = grams.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 50)).select("shingle")
    val g2 = graft.core.Materialize(grams.join(keep, "shingle"))
    val half = g2.as("a").join(g2.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .distinct()
    graft.core.Materialize(
      half.union(half.select(col("dst").as("src"), col("src").as("dst"))))
  }

  /** Cluster labels for every doc with ≥1 candidate edge — the K-round
    * min-label propagation described at [[q69]], shared by q69 (label
    * dump) and q72 (canonical selection). Returns (doc_id, cluster).
    */
  def neardupLabels(docs: DataFrame): DataFrame = {
    val edges = neardupEdges(docs)
    val init = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    // round k's plan embeds round k-1's subtree twice (once direct, once
    // under the join) — exponential in K unless Spark's exchange-reuse
    // cache collapses the identical subtrees. At sf0.1 it reliably does;
    // on 10x corpora MEASURED standalone runs showed the reuse
    // intermittently missing (AQE replanning) and the recompute blowing
    // up 2-4x. So lineage is cut MID-LOOP, after round 2: the label
    // table is only the edge-endpoint set (tiny — 50k rows at the 10x
    // stress corpus), so the checkpoint costs milliseconds and caps the
    // un-reused recompute depth at one round on either side. (Per-round
    // checkpointing measured ~1.7x slower at sf0.1 — the fixed write
    // cost x3 dominates a sub-2s query; one cut is the knee.)
    val labels = (1 to 3).foldLeft(init) { (l, round) =>
      val next = l.union(
          edges.join(l, edges("src") === l("id"))
            .select(edges("dst").as("id"), l("lbl")))
        .groupBy("id").agg(min("lbl").as("lbl"))
      if (round == 2) graft.core.Materialize(next) else next
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** The DuckDB CTE chain building the SAME symmetric capped edge list as
    * [[neardupEdges]] (through `edges`), shared by the q69/q72 unrolled
    * oracles and q101's recursive-CTE fixpoint oracle.
    */
  private[llmops] lazy val neardupEdgesCtes: String = s"""toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 5),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(ts) - 3),
                    i -> ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                      || '_' || ts[i+4])) AS g
                FROM toks)),
            keep AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 50),
            half AS (
              SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
              FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
              WHERE a.doc_id < b.doc_id),
            edges AS (SELECT src, dst FROM half
                      UNION ALL SELECT dst, src FROM half)"""

  /** K=3 unrolled label rounds (l0..l3) on top of [[neardupEdgesCtes]] —
    * the q69/q72 oracle form.
    */
  private lazy val neardupLabelsCtes: String = s"""$neardupEdgesCtes,
            l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
            l1 AS (SELECT id, MIN(lbl) AS lbl FROM (
                     SELECT id, lbl FROM l0
                     UNION ALL
                     SELECT e.dst AS id, l.lbl FROM edges e JOIN l0 l ON l.id = e.src)
                   GROUP BY id),
            l2 AS (SELECT id, MIN(lbl) AS lbl FROM (
                     SELECT id, lbl FROM l1
                     UNION ALL
                     SELECT e.dst AS id, l.lbl FROM edges e JOIN l1 l ON l.id = e.src)
                   GROUP BY id),
            l3 AS (SELECT id, MIN(lbl) AS lbl FROM (
                     SELECT id, lbl FROM l2
                     UNION ALL
                     SELECT e.dst AS id, l.lbl FROM edges e JOIN l2 l ON l.id = e.src)
                   GROUP BY id)"""

  val q69 = QuerySpec(
    "q69_neardup_clusters",
    (s, d) => neardupLabels(Tables.documents(s, d)).orderBy("doc_id"),
    Some(s"""WITH $neardupLabelsCtes
            SELECT id AS doc_id, lbl AS cluster FROM l3 ORDER BY doc_id""")
  )

  // --------------------------------------------------------------- q101
  /** TRUE connected components — min-label propagation run to a FIXPOINT,
    * the production form q69's scaladoc promises ("production runs the
    * same loop to a fixpoint"). q69's bounded K=3 is the exactly-checkable
    * contract; this operator is what a curation run actually ships when
    * dup chains can exceed K hops (A~B~C~...~Z truncation chains), and the
    * q69/q101 pair mirrors q59/q61: oracle twin + production twin, both
    * oracled.
    *
    * LOOP SHAPE (the Pregel idiom without a framework): each round is one
    * keyed join + min-aggregate over the LABEL table — which holds only
    * edge-endpoint docs, a vanishing fraction of a real corpus — followed
    * by a lineage cut ([[graft.core.Materialize]]: localCheckpoint locally,
    * reliable checkpoint/replicated persist under cluster config — a
    * 100-round lineage would otherwise stack-overflow the planner).
    * Convergence detection costs ONE tiny aggregate per round, not a join:
    * labels only ever DECREASE under min-propagation, so the label-sum is
    * strictly monotone and `sum(lbl)` (decimal — no Long overflow at any
    * corpus size) is unchanged iff no label moved. Rounds needed = graph
    * diameter; near-dup clusters are shallow cliques, so 2–3 rounds
    * typical, `maxRounds` guards pathological chains. At 100 TB each round
    * shuffles the endpoint set only — never the corpus, never the edges'
    * text.
    *
    * Contrast with alternating large-star/small-star (the O(log n)-round
    * CC of Kiveris et al.): that wins when components have LARGE diameter
    * (web graphs); for shingle-candidate graphs the diameter is small and
    * plain min-propagation does fewer total shuffles with simpler rounds.
    */
  /** The shared fixpoint engine: min-label propagation from an arbitrary
    * initial labeling. Returns the labels AND the round count (the last
    * round is the no-change verification round) so warm-start callers can
    * measure how much a seed saves. Initial labels must each be the id of
    * SOME member of their component (self-labels and previously-converged
    * component minima both qualify) — then the fixpoint is the component
    * minimum over member ids, independent of the seeding.
    */
  private[llmops] def ccFixpoint(edges: DataFrame, init: DataFrame,
                                 maxRounds: Int): (DataFrame, Int) = {
    var labels = graft.core.Materialize(init)
    def labelSum(l: DataFrame): java.math.BigDecimal = {
      // empty label table (no edges at all) sums to NULL → zero, so the
      // loop converges on the first round instead of NPE-ing
      val s = l.agg(sum(col("lbl").cast(DecimalType(38, 0))).as("s"))
        .head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      // Propagate one edge hop, checkpointed (the per-round lineage cut).
      val prop = graft.core.Materialize(
        labels.union(
            edges.join(labels, edges("src") === labels("id"))
              .select(edges("dst").as("id"), labels("lbl")))
          .groupBy("id").agg(min("lbl").as("lbl")))
      // Pointer doubling: follow lbl -> lbl(lbl) in the same round.
      // Labels are monotone non-increasing and every label is itself a
      // node id, so the hop only lowers labels toward the component
      // minimum — chains collapse in O(log diameter) rounds instead of
      // O(diameter). Fewer rounds = fewer driver-synchronized jobs, the
      // real per-round cost of any distributed fixpoint (measured: 8
      // rounds at sf0.1 without the hop). The hop is a self-join of the
      // CHECKPOINTED table — tiny, unambiguous, constant plan depth.
      val next = prop.join(
          prop.select(col("id").as("__lid"), col("lbl").as("__lbl2")),
          col("lbl") === col("__lid"), "left")
        .select(col("id"), coalesce(col("__lbl2"), col("lbl")).as("lbl"))
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
    }
    (labels.select(col("id").as("doc_id"), col("lbl").as("cluster")), round)
  }

  /** Builder diagnostic twin of [[connectedComponents]] returning rounds. */
  def ccProbe(edges: DataFrame): (DataFrame, Int) =
    ccFixpoint(edges, minNeighborInit(edges), 50)

  /** Fixpoint init one propagation step ahead of self-labels: each node
    * starts at min(itself, its neighbors) — one aggregate over the edge
    * list, the same shuffle the self-label `distinct` already paid, but
    * shallow components (near-dup cliques — the overwhelming majority)
    * arrive CONVERGED and the fixpoint's first round is already the
    * verification round. Valid init for [[ccFixpoint]]: the minimum of a
    * node and its neighbors is a member id of its component.
    */
  private def minNeighborInit(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"), least(col("src"), col("dst")).as("lbl"))
      .groupBy("id").agg(min("lbl").as("lbl"))

  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame =
    ccFixpoint(edges, minNeighborInit(edges), maxRounds)._1

  /** Warm-start CC: seed the fixpoint with previously-converged labels
    * ((id, lbl) — q101's output renamed) and run over the UPDATED edge
    * set. Old components start already collapsed, so rounds needed track
    * the DIAMETER OF THE CHANGE (how far new edges chain old components
    * together), not the corpus — the cluster-maintenance analog of
    * q73/q74's incremental store probes. Converges to exactly the
    * full-recompute answer: every seed label is a member id of its
    * component, so the fixpoint is the merged component's true minimum
    * (see [[ccFixpoint]]).
    */
  def connectedComponentsSeeded(edges: DataFrame, seed: DataFrame,
                                maxRounds: Int = 50): (DataFrame, Int) = {
    val init = edges.select(col("src").as("id")).distinct()
      .join(seed.select(col("doc_id").as("id"), col("cluster").as("seed_lbl")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("seed_lbl"), col("id")).as("lbl"))
    ccFixpoint(edges, init, maxRounds)
  }

  /** DELTA-incremental CC (round-9 verdict item 4): instead of a seeded
    * fixpoint over ALL old ∪ delta edges, CONTRACT each already-converged
    * component to its root label and run the fixpoint only on the
    * batch-incident (delta) edge list mapped through that contraction —
    * then push merged labels back onto the stored members with one keyed
    * join. Work is O(delta edges + touched components), never O(old
    * edges): the landed corpus's edge list is neither rebuilt nor
    * re-propagated.
    *
    * Correctness (same fixpoint invariant as [[ccFixpoint]]): every
    * stored label is the MIN member id of its component, so contracted
    * node ids are exactly {component minima} ∪ {unstored delta
    * endpoints}, and the contracted fixpoint's min over a merged
    * component equals the true min over all underlying members. A
    * contracted self-loop (delta edge inside one old component) adds no
    * information and is dropped. Old components untouched by the delta
    * keep their labels through the left-join coalesce; delta endpoints
    * with no stored label (batch docs, old docs whose first edge is to
    * the batch) surface through the anti-join branch.
    *
    * `deltaEdges` must be SYMMETRIC and batch-incident (≥1 endpoint in
    * the increment); `stored` is (doc_id, cluster) converged labels.
    */
  def connectedComponentsDelta(deltaEdges: DataFrame, stored: DataFrame,
                               maxRounds: Int = 50): DataFrame = {
    // stored feeds FOUR consumers (both contraction sides, the remap
    // join, the anti-join); one lineage cut here stops each from
    // re-executing the label table's final pointer-hop join.
    val storedM = graft.core.Materialize(stored)
    val seed = storedM.select(col("doc_id").as("__sid"), col("cluster").as("__slbl"))
    val srcMapped = deltaEdges
      .join(seed, col("src") === col("__sid"), "left")
      .select(coalesce(col("__slbl"), col("src")).as("src"), col("dst"))
    val contracted = srcMapped
      .join(seed, col("dst") === col("__sid"), "left")
      .select(col("src"), coalesce(col("__slbl"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val inc = connectedComponents(contracted, maxRounds)
    val mergeMap = inc.select(col("doc_id").as("__root"), col("cluster").as("__new"))
    val remapped = storedM
      .join(mergeMap, col("cluster") === col("__root"), "left")
      .select(col("doc_id"), coalesce(col("__new"), col("cluster")).as("cluster"))
    val newNodes = inc
      .join(storedM.select(col("doc_id").as("__d")), col("doc_id") === col("__d"),
        "left_anti")
    remapped.union(newNodes.select(col("doc_id"), col("cluster")))
  }

  /** q101: fixpoint near-dup components over the same capped edge list as
    * q69. Oracled via DuckDB's recursive CTE: `reach` enumerates every
    * (node, reachable-label) pair — min over it IS the component minimum —
    * so the oracle states the fixpoint declaratively while Spark iterates
    * to it; any label q101 gets wrong (loop stopped early, missed an edge
    * direction) hash-mismatches.
    */
  val q101 = QuerySpec(
    "q101_connected_components",
    (s, d) => connectedComponents(neardupEdges(Tables.documents(s, d)))
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE $neardupEdgesCtes,
            reach(id, lbl) AS (
              SELECT src AS id, src AS lbl FROM edges
              UNION
              SELECT e.dst AS id, r.lbl AS lbl
              FROM edges e JOIN reach r ON r.id = e.src)
            SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach
            GROUP BY id ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q72
  /** Canonical-document selection — the dedup OUTPUT operator: given
    * q69's cluster labels, keep exactly one representative per near-dup
    * cluster (the longest member; ties to the lowest doc_id — "longest
    * wins" is the usual curation heuristic since near-dup members differ
    * mostly by truncation/boilerplate). Emits the per-cluster decision
    * record a curation run writes to its manifest: representative, size,
    * and how many docs were dropped.
    *
    * SCALE SHAPE: the ranking window partitions by CLUSTER — groups are
    * near-dup cliques (bounded small by the candidate caps upstream),
    * never a corpus stratum, so unlike q59's language windows this
    * argmax survives 100 TB unchanged. Singleton "clusters" (docs with
    * edges but unique labels) are filtered; edge-free docs never enter
    * the label table at all — the full keep-list is
    * `docs ⟕ dropped-members` (an anti-join), not materialized here.
    */
  val q72 = QuerySpec(
    "q72_canonical_per_cluster",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // argmax as ONE aggregate, not a rank window: max over
      // (n_chars, -doc_id) structs is lexicographic, so the winner is the
      // longest member with ties to the LOWEST doc_id — same row the
      // ROW_NUMBER form picks, but with map-side partials and no
      // per-cluster sort (one shuffle of the clustered-doc set instead of
      // a window sort followed by the same shuffle)
      neardupLabels(docs)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster")
        .agg(
          count(lit(1)).as("n_members"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("__best"))
        .filter(col("n_members") >= 2)
        .select(col("cluster"), col("n_members"),
          (-col("__best.neg_id")).as("kept_doc"),
          col("__best.n_chars").as("kept_chars"))
        .orderBy("cluster")
    },
    Some(s"""WITH $neardupLabelsCtes,
            lab AS (SELECT id AS doc_id, lbl AS cluster FROM l3),
            ranked AS (
              SELECT cluster, doc_id, n_chars,
                ROW_NUMBER() OVER (PARTITION BY cluster
                  ORDER BY n_chars DESC, doc_id) AS rn
              FROM lab JOIN documents USING (doc_id))
            SELECT cluster, COUNT(*) AS n_members,
              MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
              MAX(CASE WHEN rn = 1 THEN n_chars END) AS kept_chars
            FROM ranked GROUP BY cluster
            HAVING COUNT(*) >= 2 ORDER BY cluster""")
  )

  // ---------------------------------------------------------------- q79
  /** q79: LEAKAGE-FREE train/val/test split — the assignment unit is the
    * NEAR-DUP CLUSTER, not the document. Hash-threshold splitting on
    * doc_id alone silently leaks: two near-identical docs land in train
    * and test and the eval is contaminated (the within-corpus twin of
    * q58's benchmark decontamination). Here the split key is the q69
    * cluster label (its own doc_id for edge-free docs), so every member
    * of a dup group rides the same md5 threshold into the same split.
    *
    * SCALE SHAPE: labels cover only edge-endpoint docs; the corpus joins
    * them LEFT (broadcast when the edge set is small relative to the
    * corpus, as on real data) and everything after is the per-row
    * hash-threshold idiom of q61 plus one tiny split-keyed aggregate.
    * Output is the split manifest: doc/clustered-doc/cluster counts.
    */
  /** Per-document split assignment — see [[q79]]. Returns
    * (doc_id, cluster, skey, split); the no-straddle invariant (one split
    * per cluster) is structural: split is a pure function of skey.
    *
    * The hash is SALTED with "split" (domain separation): upstream
    * sampling uses the unsalted hash of the same ids, and an unsalted
    * split would correlate perfectly with it — every rate-r-sampled doc
    * would land in train (see [[CorpusPipeline.hashFrac]]'s salted
    * overload; caught live by CurateDemo).
    */
  def leakageFreeSplit(docs: DataFrame, trainCut: Double = 0.8,
                       valCut: Double = 0.9): DataFrame = {
    import graft.llmops.CorpusPipeline.{hashFrac, rateCutoffHex}
    val keyed = docs.select("doc_id")
      .join(neardupLabels(docs), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster"),
        coalesce(col("cluster"), col("doc_id")).as("skey"))
    val h = hashFrac(col("skey"), "split")
    keyed.withColumn("split",
      when(h < rateCutoffHex(trainCut), "train")
        .when(h < rateCutoffHex(valCut), "val")
        .otherwise("test"))
  }

  val q79 = QuerySpec(
    "q79_leakage_free_split",
    (s, d) => {
      // Pre-aggregate on (split, skey) before the distinct count: a mixed
      // distinct/non-distinct aggregate plans via Expand — every corpus row
      // duplicated per aggregate group before the shuffle (q36's lesson).
      // skey groups are cluster-consistent by construction (a cluster label
      // is the min member id, and that doc is itself clustered, so no
      // unclustered doc_id can collide with a label) — after the pre-group
      // the distinct is a plain conditional count. One |corpus|-row keyed
      // shuffle instead of a 2x-expanded one.
      leakageFreeSplit(Tables.documents(s, d))
        .groupBy("split", "skey")
        .agg(count(lit(1)).as("__n"),
          first(col("cluster").isNotNull).as("__clustered"))
        .groupBy("split")
        .agg(
          sum("__n").cast("long").as("n_docs"),
          sum(when(col("__clustered"), col("__n")).otherwise(lit(0L)))
            .cast("long").as("n_clustered_docs"),
          count(when(col("__clustered"), lit(1))).as("n_clusters"))
        .orderBy("split")
    },
    Some(s"""WITH $neardupLabelsCtes,
            lab AS (SELECT id AS doc_id, lbl AS cluster FROM l3),
            keyed AS (
              SELECT d.doc_id, lab.cluster,
                COALESCE(lab.cluster, d.doc_id) AS skey
              FROM documents d LEFT JOIN lab USING (doc_id))
            SELECT CASE
                WHEN substr(md5(CAST(skey AS VARCHAR) || ':split'), 1, 8) < '${graft.llmops.CorpusPipeline.rateCutoffHex(0.8)}' THEN 'train'
                WHEN substr(md5(CAST(skey AS VARCHAR) || ':split'), 1, 8) < '${graft.llmops.CorpusPipeline.rateCutoffHex(0.9)}' THEN 'val'
                ELSE 'test' END AS split,
              COUNT(*) AS n_docs,
              COUNT(cluster) AS n_clustered_docs,
              COUNT(DISTINCT CASE WHEN cluster IS NOT NULL THEN skey END) AS n_clusters
            FROM keyed GROUP BY split ORDER BY split""")
  )

  // --------------------------------------------------------------- q113
  /** Sketch-path containment — the scale companion of q102, completing
    * the exact/sketch pairing (q27↔q30, q59↔q61): LSH-banded MinHash
    * candidates get an ASYMMETRY score from the identity
    * |A∩B| = J/(1+J)·(|A|+|B|), so est_c(A→B) = est_inter/|A| with only
    * the signature agreement and two per-doc size scalars — no shared-
    * shingle join at all. Per-doc sizes are one keyed aggregate over the
    * corpus (rides the shingle shuffle the signatures already pay).
    *
    * SCOPE, stated honestly: LSH surfaces candidates by JACCARD, so this
    * refines large∩large asymmetric pairs (doc + appended boilerplate,
    * shared blocks — J ≳ 0.2); a SMALL doc inside a much larger one has
    * near-zero Jaccard and never reaches a band bucket. At 100 TB that
    * truncation case is the HEAD-FINGERPRINT increment's job
    * (IncrementalDedup q73, prefixTokens) — the exact q102 remains the
    * oracle twin on gate data. Hash-seeded → rows-only; the spec checks
    * the estimates against exact q102 on asymmetric near-dup fixtures,
    * and [[q168]] oracle-gates the ±0.2 accuracy contract every round.
    */
  val q113 = QuerySpec(
    "q113_containment_sketch",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sigs = graft.core.Materialize(minhashSignatures(docs, k = 3))
      val pairs = minhashPairs(sigs, minSim = 0.2)
      val sizes = shingles(docs, 3).groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val j = col("est_jaccard")
      val inter = j / (j + lit(1.0)) *
        (col("s1.nsh").cast("double") + col("s2.nsh").cast("double"))
      pairs
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), col("est_jaccard"),
          ffloor(inter / col("s1.nsh").cast("double"), 4).as("est_c_d1_in_d2"),
          ffloor(inter / col("s2.nsh").cast("double"), 4).as("est_c_d2_in_d1"))
        .orderBy("d1", "d2")
    },
    None
  )

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
      val exact = bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"),
          ffloor(col("inter").cast("double") / col("s1.nbg"), 4).as("c12x"),
          ffloor(col("inter").cast("double") / col("s2.nbg"), 4).as("c21x"))
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
    val owners = fps.groupBy("fp").agg(min("doc_id").as("dup_of"))
    val exact = fps.join(owners, "fp").select(col("doc_id"), col("dup_of"))
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

  // --------------------------------------------------------------- q130
  /** Candidate-graph degree distribution — the health check on the
    * near-dup edge list itself: how many docs have 1, 2, … candidate
    * neighbours. A fat tail here means a hot-shingle cap failed (one
    * boilerplate gram fanning out) BEFORE the pair join pays for it; the
    * distribution is the evidence the caps work. Degree = outgoing edges
    * in the symmetric list; two keyed aggregates (node degree, then
    * degree histogram), both map-side combined.
    */
  val q130 = QuerySpec(
    "q130_degree_distribution",
    (s, d) =>
      neardupEdges(Tables.documents(s, d))
        .groupBy(col("src").as("doc_id"))
        .agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_docs"))
        .orderBy("degree"),
    Some(s"""WITH $neardupEdgesCtes,
            deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
            SELECT degree, COUNT(*) AS n_docs FROM deg
            GROUP BY degree ORDER BY degree""")
  )

  // --------------------------------------------------------------- q131
  /** Dup-cluster size distribution — the curation summary a dedup run
    * reports: how many components of each size the corpus collapsed
    * into (size 2 = simple pairs, big sizes = template families). Rides
    * q101's fixpoint labels; the rollup is two keyed aggregates over the
    * label table (component size, then size histogram) — O(edge-incident
    * docs), map-side combined, nothing corpus-scale.
    */
  val q131 = QuerySpec(
    "q131_cluster_size_distribution",
    (s, d) =>
      connectedComponents(neardupEdges(Tables.documents(s, d)))
        .groupBy("cluster").agg(count(lit(1)).as("csize"))
        .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
        .orderBy("csize"),
    Some(s"""WITH RECURSIVE $neardupEdgesCtes,
            reach(id, lbl) AS (
              SELECT src AS id, src AS lbl FROM edges
              UNION
              SELECT e.dst AS id, r.lbl AS lbl
              FROM edges e JOIN reach r ON r.id = e.src),
            cc AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
            cs AS (SELECT cluster, COUNT(*) AS csize FROM cc GROUP BY cluster)
            SELECT csize, COUNT(*) AS n_clusters FROM cs
            GROUP BY csize ORDER BY csize""")
  )

  // --------------------------------------------------------------- q172
  /** Triangle census of the near-dup graph: triangle count, wedge count,
    * and the global clustering coefficient 3·Δ/wedges — the structural
    * audit that tells a TEMPLATE FAMILY (docs pairwise similar → dense
    * triangles, coefficient → 1) apart from a duplication CHAIN
    * (A~B~C~… truncation ladders — many wedges, no triangles,
    * coefficient → 0), which decides whether cluster-collapse (q72) or
    * pairwise-drop is the right dedup action. Enumeration is the
    * standard oriented-edge join: each triangle a<b<c counted exactly
    * once via two keyed equi-joins on the HALF edge set; per-node work is
    * bounded by the gram df cap upstream (a node's degree ≤ Σ per-gram
    * pairings ≤ grams·(MaxDf−1)), so the join never goes quadratic in the
    * corpus. Wedges are one keyed degree aggregate, exact longs
    * throughout.
    */
  val q172 = QuerySpec(
    "q172_triangle_count",
    (s, d) => {
      val edges = neardupEdges(Tables.documents(s, d))
      val half = edges.filter(col("src") < col("dst"))
      val tri = half.as("e1")
        .join(half.as("e2"), col("e1.dst") === col("e2.src"))
        .join(half.as("e3"),
          col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
        .agg(count(lit(1)).as("n_triangles"))
      val agg = edges.groupBy("src").agg(count(lit(1)).as("dg"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(expr("dg * (dg - 1) div 2")).cast("long").as("n_wedges"))
      val he = half.agg(count(lit(1)).as("n_edges"))
      agg.crossJoin(he).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          ffloor(lit(3.0) * col("n_triangles") /
            nullif(col("n_wedges").cast("double"), lit(0.0)), 6).as("global_cc"))
    },
    Some(s"""WITH $neardupEdgesCtes,
            deg AS (SELECT src, COUNT(*) AS dg FROM edges GROUP BY src),
            na AS (SELECT COUNT(*) AS n_nodes,
                     CAST(SUM((dg * (dg - 1)) // 2) AS BIGINT) AS n_wedges
                   FROM deg),
            he AS (SELECT COUNT(*) AS n_edges FROM half),
            tri AS (SELECT COUNT(*) AS n_triangles
                    FROM half e1
                    JOIN half e2 ON e1.dst = e2.src
                    JOIN half e3 ON e3.src = e1.src AND e3.dst = e2.dst)
            SELECT n_nodes, n_edges, n_wedges, n_triangles,
              CAST(FLOOR(3.0 * n_triangles / NULLIF(CAST(n_wedges AS DOUBLE), 0.0)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS global_cc
            FROM na, he, tri""")
  )

  // --------------------------------------------------------------- q218
  /** LOCAL clustering-coefficient distribution — q172's global census,
    * resolved per node and rolled into a decile histogram: c_v =
    * 2·Δ_v / (deg_v·(deg_v−1)) tells each DOC whether its neighborhood
    * is a clique (template family member, c→1) or a star/chain hub
    * (boilerplate bridge or truncation ladder, c→0); the corpus-level
    * histogram of those values is the structural fingerprint that picks
    * per-cluster dedup policy where q172's single global number cannot
    * (a bimodal corpus — half templates, half chains — has the same
    * global coefficient as a uniformly-mediocre one).
    *
    * Exactness: the decile is PURE integer arithmetic,
    * least(9, (20·Δ_v) div (deg_v·(deg_v−1))) — floor(10·c_v) with the
    * c_v = 1 clique case folded into the top bucket — so no IEEE op
    * exists anywhere. Nodes with deg < 2 have no defined coefficient and
    * are excluded (they are exactly the simple-pair docs q131 already
    * counts as size-2 clusters).
    *
    * Scale shape: the oriented triangle join is q172's (two keyed
    * equi-joins on the HALF edge set, per-node work bounded by the gram
    * df cap); per-node Δ is one explode of the 3-node triangle rows +
    * a keyed count; everything after lives on the node table. Nothing
    * corpus-scale shuffles twice.
    */
  val q218 = QuerySpec(
    "q218_local_clustering",
    (s, d) => {
      val edges = neardupEdges(Tables.documents(s, d))
      val half = edges.filter(col("src") < col("dst"))
      val triNodes = half.as("e1")
        .join(half.as("e2"), col("e1.dst") === col("e2.src"))
        .join(half.as("e3"),
          col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
        .select(explode(array(col("e1.src"), col("e1.dst"), col("e2.dst")))
          .as("id"))
        .groupBy("id").agg(count(lit(1)).as("tri"))
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
        .join(triNodes, Seq("id"), "left")
        .na.fill(0L, Seq("tri"))
        .withColumn("cc_decile",
          least(lit(9), expr("(20 * tri) div (deg * (deg - 1))")))
        .groupBy("cc_decile")
        .agg(count(lit(1)).as("n_nodes"),
          sum("tri").cast("long").as("sum_triangles"),
          sum("deg").cast("long").as("sum_degree"))
        .orderBy("cc_decile")
    },
    Some(s"""WITH $neardupEdgesCtes,
            tris AS (
              SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              FROM half e1
              JOIN half e2 ON e1.dst = e2.src
              JOIN half e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            tn AS (
              SELECT id, CAST(COUNT(*) AS BIGINT) AS tri FROM (
                SELECT a AS id FROM tris
                UNION ALL SELECT b FROM tris
                UNION ALL SELECT c FROM tris)
              GROUP BY id),
            deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM edges GROUP BY src),
            nodes AS (
              SELECT d.id, d.deg, COALESCE(t.tri, 0) AS tri
              FROM deg d LEFT JOIN tn t USING (id)
              WHERE d.deg >= 2)
            SELECT LEAST(9, (20 * tri) // (deg * (deg - 1))) AS cc_decile,
              CAST(COUNT(*) AS BIGINT) AS n_nodes,
              CAST(SUM(tri) AS BIGINT) AS sum_triangles,
              CAST(SUM(deg) AS BIGINT) AS sum_degree
            FROM nodes GROUP BY 1 ORDER BY 1""")
  )

  // --------------------------------------------------------------- q225
  /** EDGE SUPPORT histogram — the per-EDGE structural audit closing the
    * per-graph (q172) / per-node (q218) series: an edge's support is its
    * common-neighbor count (triangles THROUGH the edge), the quantity
    * graph-sparsification and truss decomposition cut on. A candidate
    * edge with support 0 is an isolated coincidence (one shared rare
    * gram — verify before collapsing); high support means the pair sits
    * inside a mutually-similar family and survives any reasonable
    * verification. Alongside the count, the neighborhood Jaccard
    * |N(u)∩N(v)| / |N(u)∪N(v)| in exact integer micros ((cn·10⁶) div
    * (deg_u+deg_v−cn)) — the link-prediction score — averaged per
    * support level with one final ffloored division.
    *
    * Scale shape: support for ALL edges at once is the same oriented
    * wedge join q172 pays (half ⋈ edges on the shared endpoint),
    * aggregated per edge instead of globally; per-node work stays
    * bounded by the upstream gram df cap. Degrees join keyed; the
    * histogram lives on the edge table.
    */
  val q225 = QuerySpec(
    "q225_edge_support",
    (s, d) => {
      val edges = neardupEdges(Tables.documents(s, d))
      val half = edges.filter(col("src") < col("dst"))
      val cn = half.as("e")
        .join(edges.as("a"), col("e.src") === col("a.src"))
        .join(edges.as("b"),
          col("e.dst") === col("b.src") && col("a.dst") === col("b.dst"))
        .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
        .agg(count(lit(1)).as("cn"))
      val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      half
        .join(cn, Seq("src", "dst"), "left")
        .na.fill(0L, Seq("cn"))
        .join(deg.select(col("id").as("src"), col("deg").as("deg_u")), "src")
        .join(deg.select(col("id").as("dst"), col("deg").as("deg_v")), "dst")
        .withColumn("jac_micro",
          expr("(cn * 1000000) div (deg_u + deg_v - cn)"))
        .groupBy("cn")
        .agg(count(lit(1)).as("n_edges"),
          ffloor(sum("jac_micro").cast("double") /
            (count(lit(1)).cast("double") * lit(1e6)), 6).as("avg_jaccard"))
        .orderBy("cn")
    },
    Some(s"""WITH $neardupEdgesCtes,
            cn AS (
              SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS cn
              FROM half e
              JOIN edges a ON e.src = a.src
              JOIN edges b ON e.dst = b.src AND a.dst = b.dst
              GROUP BY 1, 2),
            deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM edges GROUP BY src),
            scored AS (
              SELECT COALESCE(c.cn, 0) AS cn,
                (COALESCE(c.cn, 0) * 1000000)
                  // (du.deg + dv.deg - COALESCE(c.cn, 0)) AS jac_micro
              FROM half h
              LEFT JOIN cn c ON h.src = c.src AND h.dst = c.dst
              JOIN deg du ON du.id = h.src
              JOIN deg dv ON dv.id = h.dst)
            SELECT cn, CAST(COUNT(*) AS BIGINT) AS n_edges,
              CAST(FLOOR(CAST(SUM(jac_micro) AS DOUBLE)
                / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS avg_jaccard
            FROM scored GROUP BY cn ORDER BY cn""")
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
      val exactHigh = bg.as("a")
        .join(bg.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.8)
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

  // --------------------------------------------------------------- q181
  /** REPEATED-SPAN manifest — exact-substring dedup at span granularity
    * (the Lee et al. "Deduplicating Training Data Makes Language Models
    * Better" operator): every 8-gram occurrence that is not the corpus-
    * FIRST occurrence of that 8-gram marks its token span as memorized
    * text, and overlapping marks merge into maximal per-doc spans — the
    * removal manifest a span-level deduper would cut.
    *
    * Scale shape: the 8-gram stream shuffles ONCE keyed on the gram for a
    * min-struct first-occurrence aggregate — map-side combinable, so (un
    * like pair joins) high-df grams need NO cap; singleton grams (the
    * overwhelming majority of a real corpus by Zipf) are pruned by
    * `n_occ > 1` BEFORE the join back, so the repeat join touches only
    * the duplicated tail. Span merge is gaps-and-islands over the
    * doc-local position window (q171's exchange, bounded per key by doc
    * length). First-occurrence order is (doc_id, pos) — total and
    * engine-neutral — and every later stage is integer arithmetic, so
    * the manifest is hash-exact.
    */
  val q181 = QuerySpec(
    "q181_repeated_span_manifest",
    (s, d) => {
      val sh = shinglesWithPos(Tables.documents(s, d), 8)
      val firsts = sh.groupBy("shingle")
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > 1)
        .select(col("shingle"), col("first.doc_id").as("fdoc"),
          col("first.pos").as("fpos"))
      val rep = sh.join(firsts, "shingle")
        .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
        .select("doc_id", "pos")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val newIsland = when(lag(col("pos"), 1).over(w).isNull
        .or(col("pos") > lag(col("pos"), 1).over(w) + lit(7)), 1L).otherwise(0L)
      rep
        .withColumn("island", sum(newIsland).over(wRun))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(7)).as("e"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e") - col("s") + 1).cast("long").as("n_repeated_tokens"),
          max(col("e") - col("s") + 1).cast("long").as("longest_span"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents),
            tp AS (
              SELECT doc_id, i - 1 AS pos,
                ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3]
                  || '_' || ts[i+4] || '_' || ts[i+5] || '_' || ts[i+6]
                  || '_' || ts[i+7] AS g
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS i
                    FROM toks)),
            rep AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                  ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
                  COUNT(*) OVER (PARTITION BY g) AS n_occ
                FROM tp)
              WHERE n_occ > 1 AND rn > 1),
            isl AS (
              SELECT doc_id, pos,
                CASE WHEN LAG(pos) OVER w IS NULL
                       OR pos > LAG(pos) OVER w + 7 THEN 1 ELSE 0 END AS nw
              FROM rep WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            isl2 AS (
              SELECT doc_id, pos,
                SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) AS island
              FROM isl),
            spans AS (
              SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
              FROM isl2 GROUP BY 1, 2)
            SELECT doc_id, COUNT(*) AS n_spans,
              CAST(SUM(e - s + 1) AS BIGINT) AS n_repeated_tokens,
              CAST(MAX(e - s + 1) AS BIGINT) AS longest_span
            FROM spans GROUP BY doc_id ORDER BY doc_id""")
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

  // --------------------------------------------------------------- q187
  /** K-CORE PEELING of the near-dup graph (k = 2, three unrolled peel
    * rounds): repeatedly delete vertices with fewer than 2 surviving
    * neighbours and report the graph size after each peel. The trajectory
    * is the structural dedup audit q172's one-shot census can't give:
    * duplication CHAINS (A~B~C ladders) dissolve entirely under 2-core
    * peeling while TEMPLATE FAMILIES (dense cores) survive unchanged, so
    * "how much graph is left after round 3" measures how much of the
    * candidate volume is core template mass vs incidental chain overlap —
    * which decides whether cluster-collapse or pairwise-drop is the right
    * dedup action, and at what cost.
    *
    * Bounded-K is the same deliberate contract as [[q69]]: both engines
    * compute exactly three peels (the oracle unrolls them), the label
    * table is only ever the edge-endpoint set, and each round is one
    * keyed degree aggregate + two semi-join restrictions — K shuffles of
    * the edge set, nothing corpus-scale. Production runs the identical
    * loop to a fixpoint; on shallow dedup graphs three peels converge.
    */
  /** Production PEEL-TO-FIXPOINT k-core — the form [[q187]]'s scaladoc
    * promises ("production runs the identical loop to a fixpoint"), so
    * the caller doesn't pick a round count: peel until a round removes no
    * vertex, or `maxRounds` guards a pathological chain (a path graph
    * peels one layer per round). Returns the surviving symmetric edge
    * set, the round count (the last round is the no-change verification
    * round, [[ccFixpoint]]'s convention), and whether the loop CONVERGED
    * rather than hit the guard — callers must check the flag before
    * treating the result as the true k-core.
    *
    * Convergence detection costs one tiny aggregate per round (the
    * surviving-vertex count, which only ever decreases — unchanged iff
    * the peel removed nothing), and each round is q187's exact shape:
    * one degree aggregate + two semi-join restrictions over the edge
    * set, Materialized so the plan stays one round deep. The oracled
    * bounded-K q187 is unchanged — this is the API entry point
    * (mirroring the q69 [[neardupLabels]] / q101 [[connectedComponents]]
    * oracle-twin/production-twin pair).
    */
  def kCoreFixpoint(edges0: DataFrame, k: Int,
                    maxRounds: Int = 50): (DataFrame, Int, Boolean) = {
    var cur = graft.core.Materialize(edges0)
    def nNodes(e: DataFrame): Long = {
      val n = e.agg(countDistinct(col("src"))).head.getLong(0)
      n
    }
    var prevN = nNodes(cur)
    var round = 0
    var converged = prevN == 0L // empty graph is already its own k-core
    while (!converged && round < maxRounds) {
      round += 1
      val keep = graft.core.Materialize(
        cur.groupBy("src").agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k).select(col("src").as("id")))
      cur = graft.core.Materialize(cur
        .join(keep.select(col("id").as("src")), "src")
        .join(keep.select(col("id").as("dst")), "dst")
        .select("src", "dst"))
      val n = nNodes(cur)
      converged = n == prevN
      prevN = n
    }
    (cur, round, converged)
  }

  val q187 = QuerySpec(
    "q187_kcore_decomposition",
    (s, d) => {
      def stat(round: Int, edges: DataFrame): DataFrame =
        edges.agg(
            countDistinct(col("src")).as("n_nodes"),
            count(when(col("src") < col("dst"), 1)).as("n_edges"))
          .select(lit(round.toLong).as("peel_round"), col("n_nodes"),
            col("n_edges"))
      var cur = neardupEdges(Tables.documents(s, d))
      var out = stat(0, cur)
      for (r <- 1 to 3) {
        val keep = graft.core.Materialize(
          cur.groupBy("src").agg(count(lit(1)).as("dg"))
            .filter(col("dg") >= 2).select(col("src").as("id")))
        cur = graft.core.Materialize(cur
          .join(keep.select(col("id").as("src")), "src")
          .join(keep.select(col("id").as("dst")), "dst")
          .select("src", "dst"))
        out = out.union(stat(r, cur))
      }
      out.orderBy("peel_round")
    },
    Some(s"""WITH $neardupEdgesCtes,
            k1 AS (SELECT src AS id FROM edges GROUP BY src
                   HAVING COUNT(*) >= 2),
            e1 AS (SELECT e.src, e.dst FROM edges e
                   JOIN k1 a ON e.src = a.id JOIN k1 b ON e.dst = b.id),
            k2 AS (SELECT src AS id FROM e1 GROUP BY src
                   HAVING COUNT(*) >= 2),
            e2 AS (SELECT e.src, e.dst FROM e1 e
                   JOIN k2 a ON e.src = a.id JOIN k2 b ON e.dst = b.id),
            k3 AS (SELECT src AS id FROM e2 GROUP BY src
                   HAVING COUNT(*) >= 2),
            e3 AS (SELECT e.src, e.dst FROM e2 e
                   JOIN k3 a ON e.src = a.id JOIN k3 b ON e.dst = b.id)
            SELECT CAST(0 AS BIGINT) AS peel_round,
              COUNT(DISTINCT src) AS n_nodes,
              COUNT(*) FILTER (WHERE src < dst) AS n_edges FROM edges
            UNION ALL SELECT 1, COUNT(DISTINCT src),
              COUNT(*) FILTER (WHERE src < dst) FROM e1
            UNION ALL SELECT 2, COUNT(DISTINCT src),
              COUNT(*) FILTER (WHERE src < dst) FROM e2
            UNION ALL SELECT 3, COUNT(DISTINCT src),
              COUNT(*) FILTER (WHERE src < dst) FROM e3
            ORDER BY peel_round""")
  )

  // --------------------------------------------------------------- q188
  /** SUFFIX→PREFIX STITCH detection: document pairs where the last
    * k-gram of one doc equals the first k-gram of another — the signature
    * of a single source document split across ingest records (pagination,
    * chunked crawls, continuation messages). The right curation action
    * for these is STITCHING, not dropping, which is why they need their
    * own manifest: Jaccard/LSH near-dup ops ([[q27]]/[[q30]]) score
    * continuation halves as DISSIMILAR (tiny overlap), and the span ops
    * (q111/q181) only see grams repeated verbatim, so boundary joins are
    * exactly the dup mass every other detector misses.
    *
    * Scale shape: each doc contributes ONE row per side (its first gram,
    * its last gram) — the join input is O(corpus docs), not O(grams) —
    * and the gram-keyed equi-join is df-capped at 50 per side so a
    * boilerplate opening ("subject re re re …") can never fan out
    * quadratically. Everything shuffles on the gram key once. k is the
    * precision knob: production splits carry long verbatim boundaries
    * (k ≥ 8); the ~30-word synthetic vocabulary needs k = 3 for any
    * boundary coincidence to exist at all, which also exercises the
    * FALSE-POSITIVE regime the df cap and downstream verify are for.
    */
  val q188 = QuerySpec(
    "q188_stitch_overlap",
    (s, d) => {
      val sh = shinglesWithPos(Tables.documents(s, d), 3)
      val firsts = graft.operators.Ops.capKeyFreq(
        sh.filter(col("pos") === 0).select(col("doc_id"), col("shingle")),
        50, col("shingle"))
      val lasts = graft.operators.Ops.capKeyFreq(
        sh.groupBy("doc_id")
          .agg(max(struct(col("pos"), col("shingle"))).as("l"))
          .select(col("doc_id"), col("l.pos").as("tail_pos"),
            col("l.shingle").as("shingle")),
        50, col("shingle"))
      lasts
        .join(firsts.select(col("doc_id").as("head_doc"), col("shingle")),
          "shingle")
        .filter(col("doc_id") =!= col("head_doc"))
        .select(col("doc_id").as("tail_doc"), col("head_doc"),
          col("shingle").as("stitch_gram"),
          col("tail_pos").cast("long").as("tail_pos"))
        .orderBy("tail_doc", "head_doc")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents
              WHERE len(string_split(${asciiLowerSql("text")}, ' ')) >= 3),
            firsts_all AS (
              SELECT doc_id, ts[1] || '_' || ts[2] || '_' || ts[3] AS g
              FROM toks),
            lasts_all AS (
              SELECT doc_id, ts[-3] || '_' || ts[-2] || '_' || ts[-1] AS g,
                len(ts) - 3 AS tail_pos
              FROM toks),
            firsts AS (SELECT doc_id, g FROM firsts_all
                       QUALIFY COUNT(*) OVER (PARTITION BY g) <= 50),
            lasts AS (SELECT doc_id, g, tail_pos FROM lasts_all
                      QUALIFY COUNT(*) OVER (PARTITION BY g) <= 50)
            SELECT l.doc_id AS tail_doc, f.doc_id AS head_doc,
              l.g AS stitch_gram, CAST(l.tail_pos AS BIGINT) AS tail_pos
            FROM lasts l JOIN firsts f ON l.g = f.g AND l.doc_id <> f.doc_id
            ORDER BY tail_doc, head_doc""")
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
    Seq(q21, q22, q27, q30, q31, q68, q69, q72, q79, q101, q102, q108, q111,
      q113, q123, q128, q130, q131, q168, q172, q175, q181, q186, q187, q188,
      q197, q218, q225, q242, q243)
}
