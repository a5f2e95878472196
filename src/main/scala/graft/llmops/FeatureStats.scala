package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops.{asciiLower, asciiLowerSql, ffloor}

/** Dependence / association statistics between corpus metadata axes and
  * between features and labels — the "is this column informative"
  * toolkit a curation pipeline runs before building mixtures (q60/q71),
  * classifiers (q103), or stratified samples (q59/q140).
  *
  * The reference has no query surface (its sink cannot read data back —
  * `OSSStorage.java:73-75`); these follow the repo's micro-nat log
  * contract (q93/q126: ln() of a pure-integer-derived ratio, truncated
  * to integer micro-units before any sum) and the exact-integer-products
  * discipline (q185/q192: DECIMAL(38,0)/HUGEINT for anything that can
  * pass 2^63, one double division last).
  *
  * Scale shapes: q203 is one G×L-cell aggregate with windows over the
  * CELL table only; q204 is one vocab-bounded presence aggregate with a
  * 1-row margin broadcast and a TakeOrderedAndProject top-k; q205 is the
  * q37/q122 per-user windows (bounded by one user's history, never a
  * corpus stratum) feeding a path-cardinality-bounded aggregate.
  */
object FeatureStats {

  // --------------------------------------------------------------- q203
  /** Mutual information between the `source` and `lang` axes — "does
    * source determine language?" — the statistic that decides whether
    * per-(source, lang) mixture cells (q60's grain) carry information
    * beyond per-source × per-lang marginals. MI = Σ p(s,l)·ln(p(s,l) /
    * (p(s)·p(l))), computed over the |sources|×|langs| CELL table: one
    * corpus aggregate, then windows over ≤ G·L rows (the only
    * SinglePartition window runs over that cell table — q176's
    * contract, never corpus rows). Per-cell PMI is floored to integer
    * micro-nats (q126's determinism contract) and the MI total is an
    * exact long dot product with ONE double division at the end, so the
    * whole row set hash-matches DuckDB.
    */
  val q203 = QuerySpec(
    "q203_source_lang_mi",
    (s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n_sl"))
      val wS = Window.partitionBy("source")
      val wL = Window.partitionBy("lang")
      val wAll = Window.partitionBy()
      cells
        .select(col("source"), col("lang"), col("n_sl"),
          sum("n_sl").over(wS).as("n_s"),
          sum("n_sl").over(wL).as("n_l"),
          sum("n_sl").over(wAll).as("n"))
        .withColumn("pmi_micro",
          floor(log(
            (col("n_sl").cast("double") * col("n").cast("double")) /
              (col("n_s").cast("double") * col("n_l").cast("double"))) * lit(1e6))
            .cast("long"))
        .withColumn("mi_nats",
          ffloor(sum(col("n_sl") * col("pmi_micro")).over(wAll).cast("double") /
            (col("n").cast("double") * lit(1e6)), 6))
        .select("source", "lang", "n_sl", "pmi_micro", "mi_nats")
        .orderBy("source", "lang")
    },
    Some("""WITH cells AS (
              SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY 1, 2),
            m AS (
              SELECT source, lang, n_sl,
                CAST(SUM(n_sl) OVER (PARTITION BY source) AS BIGINT) AS n_s,
                CAST(SUM(n_sl) OVER (PARTITION BY lang) AS BIGINT) AS n_l,
                CAST(SUM(n_sl) OVER () AS BIGINT) AS n
              FROM cells),
            p AS (
              SELECT source, lang, n_sl, n,
                CAST(FLOOR(ln((CAST(n_sl AS DOUBLE) * CAST(n AS DOUBLE))
                  / (CAST(n_s AS DOUBLE) * CAST(n_l AS DOUBLE))) * 1000000.0)
                  AS BIGINT) AS pmi_micro
              FROM m)
            SELECT source, lang, n_sl, pmi_micro,
              CAST(FLOOR(CAST(SUM(n_sl * pmi_micro) OVER () AS DOUBLE)
                / (CAST(n AS DOUBLE) * 1000000.0) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS mi_nats
            FROM p ORDER BY source, lang""")
  )

  // --------------------------------------------------------------- q204
  /** Chi-square term selection against a binary label (lang = 'en' vs
    * rest) — the classic feature-selection statistic for classifier
    * vocabularies (the q103 NB model's input list, chosen on evidence
    * instead of raw frequency). Per term, document-presence counts a/b
    * against the label split; χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Determinism: every factor is an exact integer; (ad−bc)²·N can pass
    * 2^63 on a large corpus, so the numerator/denominator are
    * DECIMAL(38,0)/HUGEINT products (q185's contract) with ONE double
    * division + ffloor at the end. Terms present in every document are
    * excluded (zero denominator, zero information); a degenerate corpus
    * with a single-language label split emits zero rows in BOTH engines
    * (npos/nneg guard). Top-20 by (χ², term) — unique per term — ships
    * via TakeOrderedAndProject.
    *
    * Scale: presence is one (doc, term) distinct + one vocab-bounded
    * aggregate riding the same shuffle key; margins are a 1-row
    * broadcast. Nothing corpus-sized shuffles twice.
    */
  val q204 = QuerySpec(
    "q204_chi2_terms",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pres = docs
        .select(col("doc_id"), (col("lang") === "en").as("pos"),
          explode(split(asciiLower(col("text")), " ")).as("tok"))
        .distinct()
      val tot = docs.agg(
        count(when(col("lang") === "en", 1)).as("npos"),
        count(when(col("lang") =!= "en", 1)).as("nneg"))
      pres.groupBy("tok").agg(
          count(when(col("pos"), 1)).as("df_pos"),
          count(when(!col("pos"), 1)).as("df_neg"))
        .crossJoin(broadcast(tot))
        .filter(col("npos") > 0 && col("nneg") > 0 &&
          col("df_pos") + col("df_neg") < col("npos") + col("nneg"))
        .withColumn("cc", col("npos") - col("df_pos"))
        .withColumn("dd", col("nneg") - col("df_neg"))
        .withColumn("diff", col("df_pos") * col("dd") - col("df_neg") * col("cc"))
        .withColumn("num",
          col("diff").cast(DecimalType(38, 0)) * col("diff") *
            (col("npos") + col("nneg")))
        .withColumn("den",
          ((col("df_pos") + col("df_neg")) * (col("cc") + col("dd")))
            .cast(DecimalType(38, 0)) * col("npos") * col("nneg"))
        .select(col("tok"), col("df_pos"), col("df_neg"),
          ffloor(col("num").cast("double") / col("den").cast("double"), 4)
            .as("chi2"))
        .orderBy(col("chi2").desc, col("tok"))
        .limit(20)
    },
    Some(s"""WITH pres AS (
              SELECT DISTINCT doc_id, pos, tok FROM (
                SELECT doc_id, lang = 'en' AS pos,
                  unnest(string_split(${asciiLowerSql("text")}, ' ')) AS tok
                FROM documents)),
            tot AS (
              SELECT COUNT(CASE WHEN lang = 'en' THEN 1 END) AS npos,
                     COUNT(CASE WHEN lang <> 'en' THEN 1 END) AS nneg
              FROM documents),
            c AS (
              SELECT tok, COUNT(CASE WHEN pos THEN 1 END) AS df_pos,
                     COUNT(CASE WHEN NOT pos THEN 1 END) AS df_neg
              FROM pres GROUP BY 1),
            x AS (
              SELECT tok, df_pos, df_neg, npos - df_pos AS cc,
                     nneg - df_neg AS dd, npos, nneg
              FROM c CROSS JOIN tot
              WHERE npos > 0 AND nneg > 0 AND df_pos + df_neg < npos + nneg),
            y AS (
              SELECT tok, df_pos, df_neg,
                CAST(df_pos * dd - df_neg * cc AS HUGEINT) AS diff,
                CAST((df_pos + df_neg) * (cc + dd) AS HUGEINT)
                  * npos * nneg AS den,
                npos + nneg AS n
              FROM x)
            SELECT tok, df_pos, df_neg,
              CAST(FLOOR(CAST(diff * diff * n AS DOUBLE) / CAST(den AS DOUBLE)
                * 10000.0) AS DOUBLE) / 10000.0 AS chi2
            FROM y ORDER BY chi2 DESC, tok LIMIT 20""")
  )

  // --------------------------------------------------------------- q205
  /** Top user-session paths — the "what do users actually do" table
    * behind funnel design (q114 consumes its output): sessions are
    * q37's 4-hour-gap islands, each session's first ≤ 8 event types
    * joined into a path string, top-10 paths by frequency. Every window
    * partitions by user (or user+session) — bounded by one user's
    * history, the q37/q122 contract — and the path aggregate's
    * cardinality is bounded by the distinct-path count (≤ |types|^8 in
    * theory, tiny in practice), never by events. The 8-event cap bounds
    * the path string; sort_array over (ts, event_id, type) structs makes
    * the in-session order deterministic on both engines.
    */
  val q205 = QuerySpec(
    "q205_session_paths",
    (s, d) => {
      val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ws = Window.partitionBy("user_id", "sid")
        .orderBy(col("ts"), col("event_id"))
      val sessions = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wu))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") >= lit(4L * 3600 * 1000000), 1)
            .otherwise(0))
        .withColumn("sid",
          sum("new_s").over(wu.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .withColumn("rn", row_number().over(ws))
        .filter(col("rn") <= 8)
      sessions
        .groupBy("user_id", "sid")
        .agg(array_join(
          transform(
            sort_array(collect_list(struct(
              unix_micros(col("ts")).as("us"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(10)
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
              FROM events),
            g AS (
              SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts >= LAG(ts) OVER w + INTERVAL 4 HOUR
                        THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            i AS (
              SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
              FROM g),
            r AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                ORDER BY ts, event_id) AS rn
              FROM i),
            p AS (
              SELECT user_id, sid,
                string_agg(event_type, '>' ORDER BY ts, event_id) AS path
              FROM r WHERE rn <= 8 GROUP BY 1, 2)
            SELECT path, COUNT(*) AS n_sessions
            FROM p GROUP BY 1
            ORDER BY n_sessions DESC, path LIMIT 10""")
  )

  val all: Seq[QuerySpec] = Seq(q203, q204, q205)
}
