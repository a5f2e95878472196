package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Ops._
import Warehouse._

/** Time-series / statistical-test side of the warehouse stack,
  * extracted UNCHANGED from `Warehouse.scala` (round-10 verdict
  * item 4: pure-move split so per-file audit tallies stay meaningful;
  * no logic edits): trend regression, Benford audit, autocorrelation,
  * CUSUM changepoint, Theil-Sen, MAD outliers, sequence mining,
  * weekly seasonality, and the experimentation stack (A/B z-test,
  * CUPED, Mann-Whitney AUC). Star-schema revenue, SCD2, referential /
  * deletion audits, table profile and compaction planning stay in
  * [[Warehouse]].
  */
object TimeSeries {
  // --------------------------------------------------------------- q156
  /** Per-type value trend: OLS slope/intercept of event value over time,
    * from the five exact sufficient sums (n, Σx, Σy, Σxy, Σx²) — the
    * closed form every metrics pipeline uses for "is this KPI drifting".
    * x is integer epoch-days, y integer cents, so all five sums are
    * exact longs in one map-side-combined aggregate; the slope algebra
    * is then a fixed IEEE chain on those integers (ffloor-truncated),
    * bit-identical cross-engine — the reason to spell the closed form
    * instead of calling an engine's regr_slope (whose internal update
    * order is implementation-defined).
    */
  val q156 = QuerySpec(
    "q156_trend_regression",
    (s, d) => {
      val x = floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
        .cast("long")
      val y = floor(col("value") * lit(100.0)).cast("long")
      val m = Tables.events(s, d)
        .select(col("event_type"), x.as("x"), y.as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val nD = col("n").cast("double")
      val slopeCents = (col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") / nD) /
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / nD)
      m.select(col("event_type"), col("n"),
          ffloor(slopeCents / lit(100.0), 6).as("slope_per_day"),
          ffloor((col("sy").cast("double") / nD -
            slopeCents * (col("sx").cast("double") / nD)) / lit(100.0), 4)
            .as("intercept"))
        .orderBy("event_type")
    },
    Some("""WITH m AS (
              SELECT event_type, COUNT(*) AS n,
                SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
              FROM (SELECT event_type,
                      CAST(FLOOR(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                        / 86400000000.0) AS BIGINT) AS x,
                      CAST(FLOOR(value * 100.0) AS BIGINT) AS y
                    FROM events)
              GROUP BY event_type)
            SELECT event_type, n,
              CAST(FLOOR(
                ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                / 100.0 * 1000000.0) AS DOUBLE) / 1000000.0 AS slope_per_day,
              CAST(FLOOR(
                (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                / 100.0 * 10000.0) AS DOUBLE) / 10000.0 AS intercept
            FROM m ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q161
  /** Benford first-digit audit on order totals — the classic
    * fabricated-data detector (organically-generated monetary amounts
    * follow log10(1+1/d); synthetic or tampered ones usually don't).
    * Output per leading digit: observed count, observed frequency, the
    * Benford expectation, and the absolute deviation — the inputs to
    * whichever test statistic the auditor prefers. The leading digit is
    * pure integer/string expression work; one 9-row aggregate.
    * Expectation frequencies are micro-truncated CONSTANTS (computed
    * identically from log10 in both engines), so the row stays
    * hash-comparable.
    */
  val q161 = QuerySpec(
    "q161_benford_audit",
    (s, d) => {
      val firstDigit = substring(abs(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int")
      val n = Window.partitionBy()
      val expMicro = floor(log10(lit(1.0) + lit(1.0) / col("digit")) * lit(1e6))
      Tables.orders(s, d)
        // < 1e7 keeps double→string in plain (non-scientific) notation in
      // BOTH engines; Spark renders 1e7+ as "1.0E7"
      .filter(abs(col("o_totalprice")) >= 1.0 && abs(col("o_totalprice")) < 1e7)
        .select(firstDigit.as("digit"))
        .filter(col("digit").between(1, 9))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
        .withColumn("total", sum(col("n_orders")).over(n))
        .select(col("digit"), col("n_orders"),
          ffloor(col("n_orders").cast("double") / col("total"), 6).as("obs_freq"),
          (expMicro / lit(1e6)).as("benford_freq"))
        .withColumn("abs_dev",
          ffloor(abs(col("obs_freq") - col("benford_freq")), 6))
        .orderBy("digit")
    },
    Some("""WITH d AS (
              SELECT CAST(substr(CAST(abs(o_totalprice) AS VARCHAR), 1, 1) AS INT)
                AS digit
              FROM orders WHERE abs(o_totalprice) >= 1.0 AND abs(o_totalprice) < 10000000.0),
            c AS (SELECT digit, COUNT(*) AS n_orders FROM d
                  WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
            t AS (SELECT digit, n_orders, SUM(n_orders) OVER () AS total FROM c),
            f AS (
              SELECT digit, n_orders,
                CAST(FLOOR(CAST(n_orders AS DOUBLE) / total * 1000000.0) AS DOUBLE)
                  / 1000000.0 AS obs_freq,
                CAST(FLOOR(log10(1.0 + 1.0 / digit) * 1000000.0) AS DOUBLE)
                  / 1000000.0 AS benford_freq
              FROM t)
            SELECT digit, n_orders, obs_freq, benford_freq,
              CAST(FLOOR(abs(obs_freq - benford_freq) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS abs_dev
            FROM f ORDER BY digit""")
  )

  // --------------------------------------------------------------- q163
  /** Lag-k autocorrelation of daily event counts (k = 1 and 7) — the
    * seasonality detector: strong lag-7 means weekly rhythm, strong
    * lag-1 means momentum/trend. Daily counts first (tiny series), then
    * a self-join at each lag on integer epoch-days, then Pearson r from
    * six exact long sums with one fixed-IEEE formula (q156's closed-form
    * discipline). No window functions at all — the lag join IS the
    * pairing.
    */
  val q163 = QuerySpec(
    "q163_autocorrelation",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      def corrAtLag(k: Int): DataFrame = {
        val a = daily.select(col("event_type"), col("day"), col("n").as("x"))
        val b = daily.select(col("event_type").as("et2"),
          col("day").as("day2"), col("n").as("y"))
        val m = a.join(b, col("event_type") === col("et2") &&
            col("day2") === col("day") + k)
          .groupBy("event_type")
          .agg(count(lit(1)).as("np"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val nD = col("np").cast("double")
        val num = col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") / nD
        val den = sqrt(greatest(col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / nD, lit(0.0))) *
          sqrt(greatest(col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double") / nD, lit(0.0)))
        m.select(col("event_type"), lit(k).as("lag"), col("np").as("n_pairs"),
          ffloor(num / nullif(den, lit(0.0)), 6).as("autocorr"))
      }
      corrAtLag(1).unionAll(corrAtLag(7)).orderBy("event_type", "lag")
    },
    Some {
      def sql(k: Int) =
        s"""SELECT a.event_type, $k AS lag, COUNT(*) AS n_pairs,
              CAST(FLOOR(
                (CAST(SUM(a.n * b.n) AS DOUBLE)
                 - CAST(SUM(a.n) AS DOUBLE) * CAST(SUM(b.n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                / NULLIF(
                    sqrt(GREATEST(CAST(SUM(a.n * a.n) AS DOUBLE)
                      - CAST(SUM(a.n) AS DOUBLE) * CAST(SUM(a.n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 0.0))
                    * sqrt(GREATEST(CAST(SUM(b.n * b.n) AS DOUBLE)
                      - CAST(SUM(b.n) AS DOUBLE) * CAST(SUM(b.n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 0.0)),
                    0.0)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS autocorr
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.day = a.day + $k
            GROUP BY a.event_type"""
      s"""WITH daily AS (
              SELECT event_type,
                CAST(FLOOR(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                  / 86400000000.0) AS BIGINT) AS day,
                COUNT(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT * FROM (${sql(1)} UNION ALL ${sql(7)})
            ORDER BY event_type, lag"""
    }
  )

  // --------------------------------------------------------------- q164
  /** CUSUM changepoint scan: per event type, the day where the cumulative
    * deviation of daily counts from the series mean peaks — the standard
    * "when did the level shift" detector. Exactness trick: instead of
    * cumsum(x_i − mean) in doubles, track C_t = n·prefix_t − t·S (all
    * longs, EXACT — multiply through by n to avoid the fractional mean),
    * whose argmax is the same day. The prefix window runs over the tiny
    * daily series; the argmax is one max-of-struct aggregate (|C| desc,
    * earliest day ties).
    */
  val q164 = QuerySpec(
    "q164_cusum_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = daily.groupBy("event_type")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("nd"))
      daily.join(broadcast(tot), "event_type")
        .withColumn("t", count(lit(1)).over(w))
        .withColumn("prefix", sum(col("x")).over(w))
        .withColumn("c", col("nd") * col("prefix") - col("t") * col("s"))
        .groupBy("event_type")
        .agg(max(struct(abs(col("c")).as("mag"), (-col("day")).as("neg_day"),
          col("c").as("cval"))).as("__best"), first(col("nd")).as("n_days"))
        .select(col("event_type"), col("n_days"),
          (-col("__best.neg_day")).as("change_day"),
          col("__best.cval").as("cusum_scaled"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type,
                CAST(FLOOR(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                  / 86400000000.0) AS BIGINT) AS day,
                COUNT(*) AS x
              FROM events GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS s,
                      COUNT(*) AS nd FROM daily GROUP BY 1),
            pre AS (
              SELECT d.event_type, day, nd,
                CAST(nd * SUM(x) OVER w - (COUNT(*) OVER w) * s AS BIGINT) AS c
              FROM daily d JOIN tot USING (event_type)
              WINDOW w AS (PARTITION BY d.event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            best AS (
              SELECT event_type, nd AS n_days, day AS change_day, c AS cusum_scaled,
                ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY abs(c) DESC, day ASC) AS rk
              FROM pre)
            SELECT event_type, n_days, change_day, cusum_scaled
            FROM best WHERE rk = 1 ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q169
  /** Theil–Sen robust trend: per event type, the MEDIAN of all pairwise
    * daily-count slopes — the estimator that shrugs off the outlier days
    * that wreck q156's OLS (29.3% breakdown point vs 0%). The pair join is
    * strictly over the DERIVED day series (d days → d·(d−1)/2 pairs, ~500
    * for a month — trivially bounded; at 100 TB the series length depends
    * on retention, not corpus size). Slopes are exact-int differences
    * IEEE-divided, and the median is Spark `percentile` ≡ DuckDB
    * `quantile_cont` (q43's established cross-engine pairing), truncated
    * to micro.
    */
  val q169 = QuerySpec(
    "q169_theil_sen",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val a = daily.select(col("event_type"), col("day"), col("n").as("x"))
      val b = daily.select(col("event_type").as("et2"),
        col("day").as("day2"), col("n").as("y"))
      a.join(b, col("event_type") === col("et2") && col("day") < col("day2"))
        .select(col("event_type"),
          ((col("y") - col("x")).cast("double") /
            (col("day2") - col("day")).cast("double")).as("slope"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          ffloor(expr("percentile(slope, 0.5)"), 6).as("sen_slope"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type,
                CAST(FLOOR(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                  / 86400000000.0) AS BIGINT) AS day,
                COUNT(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT a.event_type, COUNT(*) AS n_pairs,
              CAST(FLOOR(quantile_cont(
                CAST(b.n - a.n AS DOUBLE) / CAST(b.day - a.day AS DOUBLE), 0.5)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS sen_slope
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY a.event_type ORDER BY a.event_type""")
  )

  // --------------------------------------------------------------- q174
  /** MAD robust outlier days: the modified z-score 0.6745·(x−med)/MAD
    * (Iglewicz–Hoaglin) over per-type daily counts — the robust companion
    * to q138's mean/σ z-score, immune to the outliers it is hunting
    * (median and MAD have 50% breakdown vs 0% for mean/σ). Both medians
    * are `percentile` ≡ `quantile_cont` over the TINY derived day series;
    * the two medians broadcast back as one-row-per-type tables. MAD = 0
    * (≥ half the days identical) yields NULL z via nullif → those days
    * can never be flagged, the estimator's documented behavior.
    */
  val q174 = QuerySpec(
    "q174_mad_outliers",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy("event_type")
        .agg(expr("percentile(n, 0.5)").as("med"))
      val withMed = daily.join(broadcast(med), "event_type")
      val mad = withMed
        .select(col("event_type"), abs(col("n").cast("double") - col("med")).as("adev"))
        .groupBy("event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      val z = lit(0.6745) * (col("n").cast("double") - col("med")) /
        nullif(col("mad"), lit(0.0))
      withMed.join(broadcast(mad), "event_type")
        .select(col("event_type"), col("day"), col("n"), ffloor(z, 6).as("mod_z"))
        .filter(abs(col("mod_z")) >= 2.0)
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type,
                CAST(FLOOR(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                  / 86400000000.0) AS BIGINT) AS day,
                COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
                    FROM daily GROUP BY 1),
            mad AS (
              SELECT d.event_type,
                quantile_cont(abs(CAST(n AS DOUBLE) - med), 0.5) AS mad
              FROM daily d JOIN med USING (event_type) GROUP BY 1),
            z AS (
              SELECT d.event_type, day, n,
                CAST(FLOOR(0.6745 * (CAST(n AS DOUBLE) - med)
                  / NULLIF(mad, 0.0) * 1000000.0) AS DOUBLE) / 1000000.0 AS mod_z
              FROM daily d JOIN med USING (event_type) JOIN mad USING (event_type))
            SELECT event_type, day, n, mod_z FROM z
            WHERE abs(mod_z) >= 2.0 ORDER BY event_type, day""")
  )

  // --------------------------------------------------------------- q182
  /** Sequential-pattern mining: the top event-type TRIGRAM sequences by
    * user support — "what do users actually do in order", the
    * PrefixSpan-class question every product-analytics warehouse asks.
    * The full PrefixSpan lattice is unnecessary for fixed length-3
    * patterns: two `lead`s over the per-user time window enumerate every
    * consecutive trigram in ONE pass, and support is a keyed aggregate
    * on the pattern string. Scale shape: the only corpus-wide shuffle is
    * the user_id window (bounded per key by a user's event count — the
    * same exchange q122's transition matrix rides), then the pattern
    * aggregate is at most |types|³ groups with map-side partials.
    * n_users is distinct-by-construction: the (pattern, user_id) dedup
    * happens inside the same aggregate. Final top-10 is a
    * TakeOrderedAndProject with a UNIQUE sort key (support desc, then
    * pattern — patterns are distinct group keys).
    */
  val q182 = QuerySpec(
    "q182_sequence_mining",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e3").isNotNull)
        .select(col("user_id"),
          concat_ws(">", col("e1"), col("e2"), col("e3")).as("pattern"))
        .groupBy("pattern")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_users").desc, col("n_occurrences").desc, col("pattern"))
        .limit(10)
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type AS e1,
                LEAD(event_type, 1) OVER w AS e2,
                LEAD(event_type, 2) OVER w AS e3
              FROM events
              WINDOW w AS (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id)),
            tri AS (
              SELECT user_id, e1 || '>' || e2 || '>' || e3 AS pattern
              FROM seq WHERE e3 IS NOT NULL)
            SELECT pattern,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM tri GROUP BY pattern
            ORDER BY n_users DESC, n_occurrences DESC, pattern
            LIMIT 10""")
  )

  // --------------------------------------------------------------- q183
  /** Day-of-week seasonality index per event type: (mean events on this
    * weekday) / (mean events per day overall) — the seasonal factor a
    * capacity planner or anomaly detector divides out before trending.
    * Weekday is ENGINE-NEUTRAL integer arithmetic on epoch days
    * (`day % 7`; day 0 = 1970-01-01 = a Thursday) — never `dayofweek()`,
    * whose origin differs across engines. The corpus reduces to the
    * (type, day) daily series FIRST (one keyed aggregate — the q138/q169
    * discipline), so the seasonal rollup and the per-type totals both run
    * over d-row series, never raw events. The index is one fixed-IEEE
    * division of exact long products: (sd·nt) and (nd·st) are < 2^53 for
    * any realistic retention, so the doubles are exact before the single
    * divide.
    */
  val q183 = QuerySpec(
    "q183_weekly_seasonality",
    (s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      val tot = daily.groupBy("event_type")
        .agg(sum(col("cnt")).cast("long").as("st"),
          count(lit(1)).cast("long").as("nt"))
      daily
        .groupBy(col("event_type"), (col("day") % 7).as("dow"))
        .agg(sum(col("cnt")).cast("long").as("n_events"),
          count(lit(1)).cast("long").as("n_days"))
        .join(broadcast(tot), "event_type")
        .select(col("event_type"), col("dow"), col("n_days"), col("n_events"),
          ffloor((col("n_events").cast("double") * col("nt").cast("double")) /
            (col("n_days").cast("double") * col("st").cast("double")), 4)
            .as("seasonal_idx"))
        .orderBy("event_type", "dow")
    },
    Some("""WITH daily AS (
              SELECT event_type,
                epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                COUNT(*) AS cnt
              FROM events GROUP BY 1, 2),
            tot AS (
              SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS st,
                CAST(COUNT(*) AS BIGINT) AS nt
              FROM daily GROUP BY event_type),
            dows AS (
              SELECT event_type, day % 7 AS dow,
                CAST(SUM(cnt) AS BIGINT) AS n_events,
                CAST(COUNT(*) AS BIGINT) AS n_days
              FROM daily GROUP BY 1, 2)
            SELECT d.event_type, dow, n_days, n_events,
              CAST(FLOOR((CAST(n_events AS DOUBLE) * CAST(nt AS DOUBLE)) /
                (CAST(n_days AS DOUBLE) * CAST(st AS DOUBLE)) * 10000.0)
                AS DOUBLE) / 10000.0 AS seasonal_idx
            FROM dows d JOIN tot t ON d.event_type = t.event_type
            ORDER BY d.event_type, dow""")
  )

  // --------------------------------------------------------------- q226
  /** Two-proportion A/B TEST with SRM guard — the experiment readout a
    * serving layer computes daily: users hash-split into two arms (the
    * q79/q99 salted-md5-digit discipline — content-addressed, so every
    * engine and re-run derives the same assignment, and the split key is
    * domain-separated from every sampling salt), per-user conversion =
    * "did the user ever purchase", then
    *
    *   z = (p1 − p0) / sqrt(p̂(1−p̂)(1/n0 + 1/n1))
    *
    * Counts stay exact longs; z pays a pinned IEEE sequence on the exact
    * operands (the q216 entropy contract), ffloored to 4. The
    * sample-ratio-mismatch guard — the check that catches a broken
    * splitter before anyone reads the p-value — is the 1-df chi²
    * (n0−n1)²/(n0+n1) against 3.84, CROSS-MULTIPLIED so the boolean
    * never touches IEEE: 100·(n0−n1)² < 384·(n0+n1).
    *
    * Scale shape: one scan → per-user aggregate (user-keyed shuffle) →
    * 2-row arm aggregate → 1-row output. Degenerate corpora (all or no
    * converters → zero pooled variance) pin z to 0 identically in both
    * engines.
    */
  val q226 = QuerySpec(
    "q226_ab_ztest",
    (s, d) => {
      val arm = (conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 8, 1), 16, 10).cast("long") % 2).as("arm")
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .select(arm, col("conv"))
      users.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("c"))
        .agg(
          max(when(col("arm") === 0, col("n"))).as("n0"),
          max(when(col("arm") === 0, col("c"))).as("c0"),
          max(when(col("arm") === 1, col("n"))).as("n1"),
          max(when(col("arm") === 1, col("c"))).as("c1"))
        .select(col("n0"), col("c0"), col("n1"), col("c1"),
          expr("(c0 * 1000000) div n0").as("rate0_micro"),
          expr("(c1 * 1000000) div n1").as("rate1_micro"),
          ffloor(
            when(
              (col("c0") + col("c1")) === 0 ||
                (col("c0") + col("c1")) === (col("n0") + col("n1")), lit(0.0))
              .otherwise(
                (col("c1").cast("double") / col("n1").cast("double") -
                  col("c0").cast("double") / col("n0").cast("double")) /
                sqrt(((col("c0") + col("c1")).cast("double") /
                  (col("n0") + col("n1")).cast("double")) *
                  (lit(1.0) - (col("c0") + col("c1")).cast("double") /
                    (col("n0") + col("n1")).cast("double")) *
                  (lit(1.0) / col("n0").cast("double") +
                    lit(1.0) / col("n1").cast("double")))), 4).as("z"),
          ((col("n0") - col("n1")) * (col("n0") - col("n1")) * 100 <
            (col("n0") + col("n1")) * 384).as("srm_ok"))
    },
    Some("""WITH users AS (
              SELECT user_id,
                CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
              FROM events GROUP BY 1),
            armed AS (
              SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                  8, 1)) AS BIGINT) % 2 AS arm, conv
              FROM users),
            arms AS (
              SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(conv) AS BIGINT) AS c
              FROM armed GROUP BY 1),
            w AS (
              SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                MAX(CASE WHEN arm = 0 THEN c END) AS c0,
                MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                MAX(CASE WHEN arm = 1 THEN c END) AS c1
              FROM arms)
            SELECT n0, c0, n1, c1,
              (c0 * 1000000) // n0 AS rate0_micro,
              (c1 * 1000000) // n1 AS rate1_micro,
              CAST(FLOOR(CASE
                WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0.0
                ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                  / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
                END * 10000.0) AS DOUBLE) / 10000.0 AS z,
              (n0 - n1) * (n0 - n1) * 100 < (n0 + n1) * 384 AS srm_ok
            FROM w""")
  )

  // --------------------------------------------------------------- q227
  /** CUPED variance-reduced experiment readout — [[q226]]'s z-test on the
    * raw post-period metric wastes power on between-user variance the
    * experiment never caused; CUPED (Deng et al., WSDM'13) removes the
    * part predictable from the PRE-period covariate: with θ =
    * cov(X,Y)/var(X) over all users, Ŷ = Y − θ·(X − X̄) has the same
    * mean and (1−ρ²)× the variance, so adj_diff is the same causal
    * estimate with tighter error bars — the standard readout at any
    * experimentation platform.
    *
    * Exactness: per-user pre/post revenue in integer CENTS (q150's
    * floor(value·100) idiom), so every moment the formula needs — Σx,
    * Σy, Σxy, Σx², per-arm Σ — is an exact integer (Σxy/Σx² in
    * DECIMAL(38,0)/HUGEINT: cents² products pass int64 on heavy users);
    * θ is computed from the cross-multiplied closed form
    * (n·Σxy − Σx·Σy)/(n·Σx² − Σx²) — exact integers down to ONE double
    * division — and the adjusted difference applies the SAME pinned
    * IEEE sequence in both engines before its ffloor.
    *
    * Scale shape: one scan → user-keyed aggregate (the experiment's
    * natural shuffle) → 2-row arm aggregate + 1-row moment aggregate →
    * 1-row output. Nothing after the per-user rollup is corpus-sized.
    */
  val q227 = QuerySpec(
    "q227_cuped",
    (s, d) => {
      val cut = lit("2024-01-15").cast("timestamp")
      val cents = floor(col("value") * lit(100.0)).cast("long")
      val arm = (conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 8, 1), 16, 10).cast("long") % 2).as("arm")
      // one corpus pass: moments AND arm sums both consume the per-user
      // table (q206/q209's multiply-consumed-subtree discipline)
      val users = graft.core.Materialize(Tables.events(s, d)
        .select(col("user_id"), col("ts"), cents.as("cents"))
        .groupBy("user_id")
        .agg(sum(when(col("ts") < cut, col("cents")).otherwise(0L))
          .cast("long").as("x"),
          sum(when(col("ts") >= cut, col("cents")).otherwise(0L))
            .cast("long").as("y"))
        .select(arm, col("x"), col("y")))
      val moments = users.agg(count(lit(1)).as("n"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y"))
          .cast(DecimalType(38, 0)).as("sxy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x"))
          .cast(DecimalType(38, 0)).as("sxx"))
      val arms = users.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("x").cast("long").as("sx"),
          sum("y").cast("long").as("sy"))
        .agg(max(when(col("arm") === 0, col("n"))).as("n0"),
          max(when(col("arm") === 0, col("sx"))).as("sx0"),
          max(when(col("arm") === 0, col("sy"))).as("sy0"),
          max(when(col("arm") === 1, col("n"))).as("n1"),
          max(when(col("arm") === 1, col("sx"))).as("sx1"),
          max(when(col("arm") === 1, col("sy"))).as("sy1"))
      arms.crossJoin(broadcast(moments))
        .withColumn("theta_raw", expr(
          """CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0
               THEN 0.0
               ELSE CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
             END"""))
        .select(col("n0"), col("n1"),
          ffloor(expr("""(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0"""), 4)
            .as("raw_diff"),
          ffloor(col("theta_raw"), 6).as("theta"),
          ffloor(expr("""((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
              - theta_raw * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / 100.0"""), 4)
            .as("adj_diff"))
    },
    Some("""WITH users AS (
              SELECT user_id,
                CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15'
                  THEN CAST(FLOOR(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
                CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                  THEN CAST(FLOOR(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
              FROM events GROUP BY 1),
            armed AS (
              SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                  8, 1)) AS BIGINT) % 2 AS arm, x, y
              FROM users),
            m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
              FROM armed),
            a AS (
              SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
              FROM armed GROUP BY 1),
            w AS (
              SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
                MAX(CASE WHEN arm = 0 THEN sy END) AS sy0,
                MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
                MAX(CASE WHEN arm = 1 THEN sy END) AS sy1
              FROM a),
            t AS (
              SELECT w.*, m.*,
                CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
                  THEN 0.0
                  ELSE CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                END AS theta_raw
              FROM w CROSS JOIN m)
            SELECT n0, n1,
              CAST(FLOOR((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0
                * 10000.0) AS DOUBLE) / 10000.0 AS raw_diff,
              CAST(FLOOR(theta_raw * 1000000.0) AS DOUBLE) / 1000000.0 AS theta,
              CAST(FLOOR(((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                - theta_raw * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / 100.0
                * 10000.0) AS DOUBLE) / 10000.0 AS adj_diff
            FROM t""")
  )

  // --------------------------------------------------------------- q235
  /** MANN–WHITNEY U / AUC effect size — the fully nonparametric leg of
    * the experiment-readout trio ([[q226]] mean z-test, [[q227]] CUPED,
    * [[graft.operators.Quantiles.q234]] median): AUC = U/(n0·n1) is the
    * probability that a random arm-1 user outspends a random arm-0 user,
    * the effect size that survives ANY monotone transform of revenue.
    *
    * Exact ranks WITHOUT a corpus sort: ranks are computed at VALUE
    * grain — group users by exact spend (integer cents), then the
    * midrank of value v is (2·cum_before(v) + c_v + 1)/2, kept as
    * doubled integers so ties never produce a fraction: 2R1 =
    * Σ_v c1v·(2·cum_before + c_v + 1), 2U1 = 2R1 − n1(n1+1), and
    * auc_micro = (2U1·10⁶) div (2·n0·n1) — DECIMAL(38,0)/HUGEINT
    * throughout, zero IEEE ops. The window runs over the value-domain
    * table (q166's contract), never the user table.
    *
    * Scale shape: scan → user aggregate → value-grain aggregate →
    * bounded window + 1-row output.
    */
  val q235 = QuerySpec(
    "q235_mann_whitney_auc",
    (s, d) => {
      val cut = lit("2024-01-15").cast("timestamp")
      val arm = conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 8, 1), 16, 10).cast("long") % 2
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("ts") >= cut,
          floor(col("value") * lit(100.0)).cast("long")).otherwise(0L))
          .cast("long").as("y"))
        .select(arm.as("arm"), col("y"))
      val byVal = users.groupBy("y")
        .agg(count(when(col("arm") === 0, 1)).as("c0"),
          count(when(col("arm") === 1, 1)).as("c1"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("y")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      byVal
        .withColumn("cb", coalesce(sum(col("c0") + col("c1")).over(w), lit(0L)))
        .agg(sum("c0").cast("long").as("n0"), sum("c1").cast("long").as("n1"),
          sum((col("c1") * (col("cb") * 2 + col("c0") + col("c1") + 1))
            .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("r1x2"))
        .select(col("n0"), col("n1"),
          (col("r1x2") - col("n1").cast(DecimalType(38, 0)) * (col("n1") + 1))
            .cast(DecimalType(38, 0)).as("u1x2"))
        .select(col("n0"), col("n1"), col("u1x2").cast("long").as("two_u1"),
          expr("CAST((u1x2 * 1000000) div (CAST(n0 AS DECIMAL(38,0)) * n1 * 2) AS BIGINT)")
            .as("auc_micro"))
    },
    Some("""WITH users AS (
              SELECT user_id,
                CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                  THEN CAST(FLOOR(value * 100.0) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
              FROM events GROUP BY 1),
            armed AS (
              SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                  8, 1)) AS BIGINT) % 2 AS arm, y
              FROM users),
            by_val AS (
              SELECT y, CAST(COUNT(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS c0,
                CAST(COUNT(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS c1
              FROM armed GROUP BY 1),
            cum AS (
              SELECT y, c0, c1,
                COALESCE(CAST(SUM(c0 + c1) OVER (ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                  0) AS cb
              FROM by_val),
            agg AS (
              SELECT CAST(SUM(c0) AS BIGINT) AS n0,
                CAST(SUM(c1) AS BIGINT) AS n1,
                CAST(SUM(CAST(c1 AS HUGEINT) * (cb * 2 + c0 + c1 + 1))
                  AS HUGEINT) AS r1x2
              FROM cum),
            u AS (
              SELECT n0, n1,
                r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2
              FROM agg)
            SELECT n0, n1, CAST(u1x2 AS BIGINT) AS two_u1,
              CAST((u1x2 * 1000000) // (CAST(n0 AS HUGEINT) * n1 * 2) AS BIGINT)
                AS auc_micro
            FROM u""")
  )

  val all: Seq[QuerySpec] =
    Seq(q156, q161, q163, q164, q169, q174, q182, q183, q226, q227, q235)
}
