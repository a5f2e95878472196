package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops._
import CorpusPipeline.{hashFrac, normalize, WhitespaceClass}
import CorpusStats._

/** Privacy / release-gate side of the corpus-stats stack, extracted
  * UNCHANGED from `CorpusStats.scala` (round-10 verdict item 4:
  * pure-move split; no logic edits): differentially-private release,
  * k-anonymity, l-diversity, t-closeness, and the bootstrap CI the
  * release scorecards cite.
  */
object PrivacyOps {
  // --------------------------------------------------------------- q170
  /** Differentially-private corpus-stat release: per-source document
    * counts with Laplace(Δf/ε) noise, ε = 1, sensitivity 1 (one document
    * moves one count by one) — the mechanism a data consortium uses to
    * publish corpus composition without revealing any single document's
    * membership. Noise is DETERMINISTIC inverse-CDF (q117's discipline —
    * no RNG state, reproducible across engines and retries): u comes from
    * the salted md5 of the source key mapped to (0,1) strictly interior
    * (the +0.5/2³² midpoint offset can never hit u = 1 → ln(0)), then
    * noise = −sign(u−½)·ln(1−2|u−½|). The release is one G-row aggregate
    * plus per-row expressions; the true count rides along as the audit
    * column a real release would drop. NOTE: deterministic per-key noise
    * is the TESTABLE skeleton — a production release draws u fresh per
    * publication or privacy composes across releases; the scaladoc is the
    * contract, the inverse-CDF map is the mechanism.
    */
  val q170 = QuerySpec(
    "q170_dp_release",
    (s, d) => {
      val u32 = conv(hashFrac(col("source"), "dp"), 16, 10).cast("double")
      val u = (u32 + lit(0.5)) / lit(4294967296.0)
      val v = u - lit(0.5)
      val noise = -signum(v) * log(lit(1.0) - lit(2.0) * abs(v))
      Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"),
          ffloor(col("n_docs").cast("double") + noise, 4).as("noisy_n_docs"),
          lit(1.0).as("epsilon"))
        .orderBy("source")
    },
    Some("""WITH c AS (
              SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
            u AS (
              SELECT source, n_docs,
                (list_reduce(list_transform(range(1, 9),
                    i -> CAST(strpos('0123456789abcdef',
                      substr(md5(source || ':dp'), i, 1)) - 1 AS DOUBLE)),
                  (a, b) -> a * 16.0 + b) + 0.5) / 4294967296.0 - 0.5 AS v
              FROM c)
            SELECT source, n_docs,
              CAST(FLOOR((CAST(n_docs AS DOUBLE)
                + (-sign(v) * ln(1.0 - 2.0 * abs(v)))) * 10000.0) AS DOUBLE)
                / 10000.0 AS noisy_n_docs,
              CAST(1.0 AS DOUBLE) AS epsilon
            FROM u ORDER BY source""")
  )

  // --------------------------------------------------------------- q191
  /** K-ANONYMOUS corpus-composition release — q170's sibling for the
    * other standard disclosure-control mechanism: publish (source, lang)
    * cell statistics only where the cell holds ≥ k = 10 documents, and
    * MERGE all smaller cells into one `__other__` bucket instead of
    * dropping them (the bucket keeps release totals reconciling with the
    * corpus — the property auditors check). The suppressed-cell count
    * rides along so consumers know how much structure the threshold hid;
    * the `__other__` row is emitted only when something was suppressed.
    *
    * Scale shape: one corpus-keyed aggregate to |sources|×|langs| cells,
    * then a cells-only split/re-aggregate (corpus-independent). Exact
    * longs throughout — no doubles to diverge.
    */
  val q191 = QuerySpec(
    "q191_kanon_release",
    (s, d) => {
      val cells = graft.core.Materialize(
        Tables.documents(s, d)
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("n_chars")))
      val released = cells.filter(col("n_docs") >= 10)
        .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
          lit(0L).as("n_merged_cells"))
      val other = cells.filter(col("n_docs") < 10)
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"),
          count(lit(1)).as("n_merged_cells"))
        .filter(col("n_merged_cells") > 0)
        .select(lit("__other__").as("source"), lit("__other__").as("lang"),
          col("n_docs"), col("n_chars"), col("n_merged_cells"))
      released.unionByName(other).orderBy("source", "lang")
    },
    Some("""WITH cells AS (
              SELECT source, lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
              FROM documents GROUP BY 1, 2),
            released AS (
              SELECT source, lang, n_docs, n_chars,
                CAST(0 AS BIGINT) AS n_merged_cells
              FROM cells WHERE n_docs >= 10),
            other AS (
              SELECT '__other__' AS source, '__other__' AS lang,
                CAST(SUM(n_docs) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                COUNT(*) AS n_merged_cells
              FROM cells WHERE n_docs < 10
              HAVING COUNT(*) > 0)
            SELECT * FROM released UNION ALL SELECT * FROM other
            ORDER BY source, lang""")
  )

  // --------------------------------------------------------------- q216
  /** L-DIVERSITY audit on q191's release grain — the disclosure-control
    * check k-anonymity alone misses: a source cell can be large (k-safe)
    * yet have every member share the same sensitive value (here: lang),
    * so membership still discloses the attribute. Per source: distinct
    * sensitive values (distinct l-diversity, threshold l ≥ 3) and the
    * Shannon entropy of the value distribution in micro-nats (entropy
    * l-diversity, threshold ln 2 — effective diversity ≥ 2). Entropy
    * follows q137's contract: per-cell n_sl·floor(ln(n_s/n_sl)·1e6)
    * exact-long contributions, ONE double division per source at the
    * end, booleans compared on the ffloored value both engines share.
    * One corpus aggregate to the G×L cell table; everything after runs
    * on cells (windows partition by source — G·L rows).
    */
  val q216 = QuerySpec(
    "q216_l_diversity",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val cells = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n_sl"))
        .withColumn("n_s", sum("n_sl").over(w))
      cells
        .withColumn("contrib",
          col("n_sl") * floor(log(col("n_s").cast("double") /
            col("n_sl").cast("double")) * lit(1e6)).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("l_distinct"),
          sum("n_sl").cast("long").as("n_docs"),
          ffloor(sum("contrib").cast("double") /
            (max("n_s").cast("double") * lit(1e6)), 6).as("entropy_nats"))
        .withColumn("distinct_ok", col("l_distinct") >= 3)
        .withColumn("entropy_ok", col("entropy_nats") >= 0.693147)
        .orderBy("source")
    },
    Some("""WITH cells AS (
              SELECT source, lang, COUNT(*) AS n_sl FROM documents
              GROUP BY 1, 2),
            m AS (
              SELECT source, lang, n_sl,
                CAST(SUM(n_sl) OVER (PARTITION BY source) AS BIGINT) AS n_s
              FROM cells),
            c AS (
              SELECT source, n_sl, n_s,
                n_sl * CAST(FLOOR(ln(CAST(n_s AS DOUBLE) / CAST(n_sl AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS contrib
              FROM m)
            SELECT source, COUNT(*) AS l_distinct,
              CAST(SUM(n_sl) AS BIGINT) AS n_docs,
              CAST(FLOOR(CAST(SUM(contrib) AS DOUBLE)
                / (CAST(MAX(n_s) AS DOUBLE) * 1000000.0) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS entropy_nats,
              COUNT(*) >= 3 AS distinct_ok,
              CAST(FLOOR(CAST(SUM(contrib) AS DOUBLE)
                / (CAST(MAX(n_s) AS DOUBLE) * 1000000.0) * 1000000.0) AS DOUBLE)
                / 1000000.0 >= 0.693147 AS entropy_ok
            FROM c GROUP BY source ORDER BY source""")
  )

  // --------------------------------------------------------------- q217
  /** T-CLOSENESS audit — the third leg of the disclosure-control tripod
    * (q191 k-anonymity: cells big enough; q216 l-diversity: values varied
    * enough; here: the in-cell sensitive distribution must be CLOSE to
    * the corpus-wide one, or membership in the cell still shifts an
    * attacker's posterior). For the categorical sensitive attribute
    * (lang) the distance is total variation — EMD under uniform ground
    * distance — TVD(source) = ½·Σ_lang |n_sl/n_s − n_l/N|.
    *
    * Exactness: each |·| term is brought to the common denominator
    * n_s·N, so the sum Σ|n_sl·N − n_l·n_s| is EXACT integer arithmetic
    * (DECIMAL(38,0)/HUGEINT — n_sl·N overflows int64 once counts pass
    * ~3·10⁹, which 100 TB corpora do); the t ≤ 0.2 gate cross-multiplies
    * (5·Σ ≤ 2·n_s·N) so the BOOLEAN never touches IEEE, and the reported
    * tvd pays one final double division, ffloored (Ops.scala contract).
    *
    * Scale shape: one corpus aggregate to the G×L cell table; the
    * missing-cell grid (a source with zero docs of some lang still
    * contributes |0 − n_l/N|) is sources × langs — both margin tables are
    * group-bounded, so the grid, the broadcasts, and every window live on
    * cells, never the corpus.
    */
  val q217 = QuerySpec(
    "q217_t_closeness",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cells = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_sl"))
      val langs = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
      val srcs = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      val total = docs.agg(count(lit(1)).as("n"))
      srcs.crossJoin(broadcast(langs))
        .join(cells, Seq("source", "lang"), "left")
        .na.fill(0L, Seq("n_sl"))
        .crossJoin(broadcast(total))
        .withColumn("num",
          abs(col("n_sl").cast(DecimalType(38, 0)) * col("n") -
            col("n_l").cast(DecimalType(38, 0)) * col("n_s")))
        .groupBy("source")
        .agg(max("n_s").cast("long").as("n_docs"),
          sum("num").cast(DecimalType(38, 0)).as("l1"),
          (max("n_s").cast(DecimalType(38, 0)) * max("n"))
            .cast(DecimalType(38, 0)).as("den"))
        .select(col("source"), col("n_docs"),
          ffloor(col("l1").cast("double") /
            (col("den").cast("double") * lit(2.0)), 6).as("tvd"),
          (col("l1") * 5 <= col("den") * 2).as("t_ok"))
        .orderBy("source")
    },
    Some("""WITH cells AS (
              SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_sl
              FROM documents GROUP BY 1, 2),
            langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l
                      FROM documents GROUP BY 1),
            srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
                     FROM documents GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
            grid AS (
              SELECT s.source, s.n_s, l.lang, l.n_l,
                COALESCE(c.n_sl, 0) AS n_sl, t.n
              FROM srcs s CROSS JOIN langs l CROSS JOIN tot t
              LEFT JOIN cells c ON c.source = s.source AND c.lang = l.lang),
            agg AS (
              SELECT source, MAX(n_s) AS n_docs,
                CAST(SUM(ABS(CAST(n_sl AS HUGEINT) * n
                  - CAST(n_l AS HUGEINT) * n_s)) AS HUGEINT) AS l1,
                CAST(MAX(n_s) AS HUGEINT) * MAX(n) AS den
              FROM grid GROUP BY source)
            SELECT source, n_docs,
              CAST(FLOOR(CAST(l1 AS DOUBLE) / (CAST(den AS DOUBLE) * 2.0)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS tvd,
              l1 * 5 <= den * 2 AS t_ok
            FROM agg ORDER BY source""")
  )

  // --------------------------------------------------------------- q224
  /** POISSON-BOOTSTRAP confidence intervals — the error bars every corpus
    * scorecard should carry and almost none do: per-source mean doc
    * length with a ~90% CI from B = 32 resamples. The classical
    * bootstrap's "draw n rows with replacement" is undistributable (it
    * needs global coordination per resample); the Poisson bootstrap
    * (Chamandy et al., Google 2012) replaces it with an independent
    * per-row replicate weight w ~ Poisson(1) — so each replica is ONE
    * more term in the same map-side-combined aggregate, no resample ever
    * materialized.
    *
    * Determinism (q170's no-RNG discipline): w is inverse-CDF over the
    * 32-bit integer of an md5 slice of (doc_id, ':boot:', b) against
    * PRECOMPUTED integer thresholds ⌊2³²·F(k)⌋ — both engines derive the
    * identical weight from data alone. The ≥6 tail (P ≈ 6·10⁻⁴)
    * collapses to w = 6: a < 10⁻⁴ unit-weight bias, far under replica
    * noise, and bit-reproducible. Replica means are exact-long weighted
    * sums with ONE ffloored division; the CI bounds are the rank-2 and
    * rank-31 replica means (≈ 90% coverage at B = 32), picked by a
    * window over the 32·G replica table with the replica id as
    * tiebreak.
    *
    * Scale shape: the corpus pays one narrow ×32 flatMap (explode of a
    * 32-element sequence + per-row md5) feeding a (source, b) aggregate
    * whose map-side partials bound the shuffle at 32·G rows; everything
    * after lives on 32·G. This is the textbook way to put error bars on
    * any 100 TB aggregate without a second corpus format.
    */
  val q224 = QuerySpec(
    "q224_bootstrap_ci",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val t = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
        4279248373L, 4292415291L)
      val u32 = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":boot:"), col("b").cast("string"))), 1, 8), 16, 10).cast("long")
      val wgt = when(col("u") < t(0), 0L).when(col("u") < t(1), 1L)
        .when(col("u") < t(2), 2L).when(col("u") < t(3), 3L)
        .when(col("u") < t(4), 4L).when(col("u") < t(5), 5L).otherwise(6L)
      val reps = docs
        .select(col("doc_id"), col("source"), col("n_chars"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u", u32)
        .select(col("source"), col("b"), wgt.as("w"), col("n_chars"))
        .groupBy("source", "b")
        .agg(sum("w").cast("long").as("wsum"),
          sum(col("w") * col("n_chars")).cast("long").as("wchars"))
        .select(col("source"), col("b"),
          when(col("wsum") > 0,
            ffloor(col("wchars").cast("double") / col("wsum").cast("double"), 6))
            .otherwise(lit(0.0)).as("rmean"))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("rmean", "b")
      val ci = reps.withColumn("rn", row_number().over(rw))
        .groupBy("source")
        .agg(max(when(col("rn") === 2, col("rmean"))).as("ci_lo"),
          max(when(col("rn") === 31, col("rmean"))).as("ci_hi"))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          ffloor(sum("n_chars").cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean_chars"))
        .join(ci, "source")
        .select(col("source"), col("n_docs"), col("mean_chars"),
          col("ci_lo"), col("ci_hi"))
        .orderBy("source")
    },
    Some("""WITH reps AS (
              SELECT source, b,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':boot:'
                  || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) AS u,
                n_chars
              FROM documents CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bb),
            wts AS (
              SELECT source, b, n_chars,
                CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
                     WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
                     WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
                     ELSE 6 END AS w
              FROM reps),
            rmeans AS (
              SELECT source, b,
                CASE WHEN SUM(w) > 0
                  THEN CAST(FLOOR(CAST(SUM(w * n_chars) AS DOUBLE)
                    / CAST(SUM(w) AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0
                  ELSE 0.0 END AS rmean
              FROM wts GROUP BY 1, 2),
            ranked AS (
              SELECT source, rmean,
                ROW_NUMBER() OVER (PARTITION BY source ORDER BY rmean, b) AS rn
              FROM rmeans),
            ci AS (
              SELECT source,
                MAX(CASE WHEN rn = 2 THEN rmean END) AS ci_lo,
                MAX(CASE WHEN rn = 31 THEN rmean END) AS ci_hi
              FROM ranked GROUP BY 1),
            pt AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS DOUBLE)
                  / 1000000.0 AS mean_chars
              FROM documents GROUP BY 1)
            SELECT p.source, p.n_docs, p.mean_chars, c.ci_lo, c.ci_hi
            FROM pt p JOIN ci c USING (source) ORDER BY p.source""")
  )

  val all: Seq[QuerySpec] = Seq(q170, q191, q216, q217, q224)
}
