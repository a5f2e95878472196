package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops.{asciiLowerSql, ffloor}

/** Retrieval-quality and corpus-inspection operators: reciprocal
  * nearest-neighbor pairs (the highest-precision semantic-dedup seed),
  * keyword-in-context concordance (the corpus linguist's grep), and
  * rank-biased overlap between two retrieval rankings (the top-weighted
  * agreement metric for scorer A/B tests).
  *
  * The reference has no query surface (`OSSStorage.java:73-75`); these
  * compose the repo's established engines: q141's blocked exact cosine,
  * q179's positional token stream, q165's twin BM25/TF-IDF rankings —
  * with the same determinism contracts (micro-floored doubles, integer
  * weights, unique sort keys).
  */
object RetrievalOps {

  /** DuckDB strict-left-fold dot product (the q29/q141 oracle idiom). */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       list_transform(range(1, len($a) + 1),
       i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"""

  // --------------------------------------------------------------- q209
  /** Reciprocal (mutual) nearest-neighbor pairs within label blocks:
    * emit (a, b) iff b is a's single nearest neighbor AND a is b's —
    * the highest-precision subset of the q141 range-search output, and
    * the standard seed set for semantic-dedup clustering (RNN pairs are
    * near-certain duplicates; one-directional NN pairs are often hubs).
    * Ties on the micro-floored cosine break toward the LOWER candidate
    * id (max-of-struct with negated id — one keyed aggregate, no window
    * shuffle), so the NN function is total and deterministic on both
    * engines. Zero-norm vectors are excluded up front (no direction, no
    * neighbor — fuzz corpora contain them).
    *
    * Scale: the pair join is label-blocked exactly like q141 (the
    * unblocked path is LSH bucketing, q32/q95); the NN reduce rides the
    * pair join's (label, id1) key; the mutual join touches the
    * |vectors|-row NN table only. Nothing is quadratic beyond the
    * blocked scoring q141 already pays.
    */
  val q209 = QuerySpec(
    "q209_mutual_nn",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id"), col("embedding"),
          Similarity.norm(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val a = e.select(col("label"), col("vec_id").as("id1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
      val b = e.select(col("label"), col("vec_id").as("id2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
      val cos = ffloor(Similarity.cosineFromParts(
        Similarity.dot(col("e1"), col("e2")), col("n1"), col("n2")), 6)
      // Score each unordered pair ONCE (the 64-dim fold is the cost);
      // both directions for the argmax come from a cheap swapped union.
      val half = a.join(b, Seq("label")).filter(col("id1") < col("id2"))
        .select(col("label"), col("id1"), col("id2"), cos.as("cos"))
      // Materialized: both sides of the mutuality self-join consume the
      // NN table (q185's contract) — without the cut the blocked pair
      // scoring runs twice. One row per vector.
      val nn = graft.core.Materialize(half
        .unionByName(half.select(col("label"), col("id2").as("id1"),
          col("id1").as("id2"), col("cos")))
        .groupBy("label", "id1")
        .agg(max(struct(col("cos"), (-col("id2")).as("nid"))).as("m"))
        .select(col("label"), col("id1"),
          (-col("m.nid")).as("id2"), col("m.cos").as("cos")))
      nn.as("x").join(nn.as("y"),
          col("x.label") === col("y.label") &&
            col("x.id2") === col("y.id1") && col("y.id2") === col("x.id1") &&
            col("x.id1") < col("y.id1"))
        .select(col("x.label").as("label"), col("x.id1").as("id1"),
          col("x.id2").as("id2"), col("x.cos").as("cos"))
        .orderBy("label", "id1")
    },
    Some(s"""WITH e AS (
              SELECT label, vec_id, embedding,
                sqrt(${dotSql("embedding", "embedding")}) AS nrm
              FROM embeddings),
            f AS (SELECT * FROM e WHERE nrm > 0),
            p AS (
              SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
                CAST(FLOOR(${dotSql("a.embedding", "b.embedding")}
                  / NULLIF(a.nrm * b.nrm, 0.0) * 1000000.0) AS DOUBLE)
                  / 1000000.0 AS cos
              FROM f a JOIN f b
                ON a.label = b.label AND a.vec_id <> b.vec_id),
            nn AS (
              SELECT label, id1, id2, cos FROM p
              QUALIFY ROW_NUMBER() OVER (PARTITION BY label, id1
                ORDER BY cos DESC, id2) = 1)
            SELECT x.label, x.id1, x.id2, x.cos
            FROM nn x JOIN nn y
              ON x.label = y.label AND x.id2 = y.id1 AND y.id2 = x.id1
                AND x.id1 < y.id1
            ORDER BY x.label, x.id1""")
  )

  // --------------------------------------------------------------- q210
  /** Keyword-in-context (KWIC) concordance for the corpus's most
    * frequent token: every occurrence with ±3 tokens of context — the
    * inspection surface behind boilerplate diagnosis (q68), PII review
    * (q65), and tokenizer debugging ("what does this token actually sit
    * next to"). The pivot term is chosen IN-QUERY (highest term
    * frequency, lexicographic tiebreak — a vocab-bounded aggregate
    * broadcast back), so the query is corpus-agnostic and both engines
    * derive the identical term.
    *
    * Plan shape: one tokenize pass; contexts come from lag/lead over
    * the doc-bounded position window (the shinglesWithPos idiom — no
    * per-token array duplication); the term filter keeps only pivot
    * rows after the window; output is occurrence-bounded with a
    * TakeOrdered(200) presentation cap. concat_ws skips the NULL
    * lags/leads at document edges on both engines; the DuckDB twin runs
    * the identical lag/lead window over the same empty-filtered stream
    * (array slicing would disagree on whitespace runs — fuzz-caught).
    */
  val q210 = QuerySpec(
    "q210_kwic_concordance",
    (s, d) => {
      val toks = Dedup.tokensWithPos(Tables.documents(s, d))
        .filter(col("tok") =!= "")
      val pivot = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(1)
        .select(col("tok").as("pivot"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      toks
        .select(col("doc_id"), col("pos"), col("tok"),
          concat_ws(" ", lag(col("tok"), 3).over(w), lag(col("tok"), 2).over(w),
            lag(col("tok"), 1).over(w)).as("left_ctx"),
          concat_ws(" ", lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w),
            lead(col("tok"), 3).over(w)).as("right_ctx"))
        .join(broadcast(pivot), col("tok") === col("pivot"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("tok").as("term"), col("left_ctx"), col("right_ctx"))
        .orderBy("doc_id", "pos")
        .limit(200)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, string_split(${asciiLowerSql("text")}, ' ') AS ts
              FROM documents),
            tp AS (
              SELECT doc_id, ts, i - 1 AS pos, ts[i] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
                    FROM toks)),
            nonempty AS (SELECT * FROM tp WHERE tok <> ''),
            pv AS (
              SELECT tok AS pivot_tok FROM nonempty GROUP BY tok
              ORDER BY COUNT(*) DESC, tok LIMIT 1),
            ctx AS (
              SELECT doc_id, pos, tok,
                concat_ws(' ', LAG(tok, 3) OVER w, LAG(tok, 2) OVER w,
                  LAG(tok, 1) OVER w) AS left_ctx,
                concat_ws(' ', LEAD(tok, 1) OVER w, LEAD(tok, 2) OVER w,
                  LEAD(tok, 3) OVER w) AS right_ctx
              FROM nonempty
              WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
            SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok AS term,
              left_ctx, right_ctx
            FROM ctx JOIN pv ON tok = pivot_tok
            ORDER BY doc_id, pos LIMIT 200""")
  )

  // --------------------------------------------------------------- q211
  /** Rank-biased overlap (RBO, p = 0.9, depth 10) between the BM25 and
    * raw TF-IDF rankings of q165's fixed query — the top-weighted
    * agreement metric (Webber et al. 2010) for scorer A/B tests: RRF
    * (q165) FUSES the rankings, RBO measures how much they AGREE, depth
    * by depth, with geometrically decaying weight. Per depth d:
    * X_d = |top-d(A) ∩ top-d(B)|; RBO@10 = Σ (1−p)·p^(d−1)·X_d/d.
    *
    * Determinism: the (1−p)·p^(d−1) weights are precomputed integer
    * NANO literals (identical text in both engines — no cross-engine
    * pow()); per-depth contributions floor((w·X_d·1e6)/d) are exact
    * longs; the final RBO is one double division. Both rankings order
    * by (score desc, doc_id) — unique total order.
    *
    * Scale: each scorer's ranking is a top-10 SELECTION
    * (TakeOrderedAndProject — per-partition heaps, no single-partition
    * sort of the matched doc set); rank assignment is a window over the
    * limit-bounded ≤10 rows. The depth sweep is a 10-row broadcast
    * cross join against the top-10 rank pairs. One tokenization pass,
    * Materialized, feeds both scorers.
    */
  val q211 = QuerySpec(
    "q211_rbo_rank_agreement",
    (s, d) => {
      val terms = Seq("spark", "join", "merge")
      // (1−0.9)·0.9^(d−1) · 1e9, floored — keep in sync with the oracle.
      val wNano = Seq(100000000L, 90000000L, 81000000L, 72900000L, 65610000L,
        59049000L, 53144100L, 47829690L, 43046721L, 38742048L)
      val docs = Tables.documents(s, d)
      val all = graft.core.Materialize(PretrainOps.termFreq(docs))
      val tf = all.filter(col("term").isin(terms: _*))
      val lens = all.groupBy("doc_id").agg(sum("tf").cast("long").as("len"))
      val nAvg = lens.agg(count(lit(1)).cast("long").as("n_docs"),
        (sum("len").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idfMicro = floor(log(
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1e6)).cast("long")
      val base = tf.join(broadcast(df), "term").join(lens, "doc_id")
        .crossJoin(broadcast(nAvg))
        .select(col("doc_id"), col("term"), col("tf"), col("len"), col("avgdl"),
          idfMicro.as("idf_micro"))
      val sat = (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(1.0) - lit(0.75) + lit(0.75) * (col("len").cast("double") / col("avgdl"))))
      val bm25 = base
        .select(col("doc_id"),
          floor(col("idf_micro").cast("double") * sat).cast("long").as("pm"))
        .groupBy("doc_id").agg(sum("pm").cast("long").as("s"))
      val tfidf = base
        .select(col("doc_id"), (col("tf") * col("idf_micro")).as("pm"))
        .groupBy("doc_id").agg(sum("pm").cast("long").as("s"))
      // Depth 10 is the metric's whole domain, so each scorer's ranking is a
      // SELECTION: orderBy(...).limit(10) plans as TakeOrderedAndProject
      // (per-partition heaps, no single-partition shuffle); the rank window
      // then runs over exactly those ≤10 rows — limit-bounded, never the
      // matched doc set. The top-10 under the unique total order
      // (s desc, doc_id) carries global ranks 1..10 by construction, and
      // only pairs with BOTH ranks ≤ depth ≤ 10 contribute to X_d, so the
      // inner join of the two top-10 sets loses nothing.
      def ranked(r: DataFrame, name: String): DataFrame = r
        .orderBy(col("s").desc, col("doc_id")).limit(10)
        .withColumn(name,
          row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
        .select(col("doc_id"), col(name))
      val joined = ranked(bm25, "ra").join(ranked(tfidf, "rb"), "doc_id")
      import s.implicits._
      val depths = wNano.zipWithIndex
        .map { case (w0, i) => (i + 1, w0) }.toDF("depth", "w_nano")
      val counts = joined.crossJoin(broadcast(depths))
        .filter(col("ra") <= col("depth") && col("rb") <= col("depth"))
        .groupBy("depth", "w_nano").agg(count(lit(1)).as("n_overlap"))
      depths.join(counts, Seq("depth", "w_nano"), "left")
        .select(col("depth").cast("long").as("depth"), col("w_nano"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .withColumn("contrib_femto",
          expr("(w_nano * n_overlap * 1000000) div depth"))
        .withColumn("rbo",
          ffloor(sum(col("contrib_femto")).over(Window.partitionBy())
            .cast("double") / lit(1e15), 6))
        .select("depth", "n_overlap", "contrib_femto", "rbo")
        .orderBy("depth")
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, unnest(string_split(${asciiLowerSql("text")}, ' ')) AS term
              FROM documents),
            tfall AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
                      WHERE term <> '' GROUP BY 1, 2),
            tf AS (SELECT * FROM tfall WHERE term IN ('spark', 'join', 'merge')),
            lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tfall GROUP BY 1),
            navg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
                     FROM lens),
            qdf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            base AS (
              SELECT tf.doc_id, tf.term, tf.tf, len, avgdl,
                CAST(FLOOR(ln(
                  (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT)
                  AS idf_micro
              FROM tf JOIN qdf USING (term) JOIN lens ON tf.doc_id = lens.doc_id
              CROSS JOIN navg),
            bm25 AS (
              SELECT doc_id, CAST(SUM(CAST(FLOOR(
                CAST(idf_micro AS DOUBLE)
                * ((CAST(tf AS DOUBLE) * 2.2)
                   / (CAST(tf AS DOUBLE) + 1.2
                      * (1.0 - 0.75 + 0.75 * (CAST(len AS DOUBLE) / avgdl))))
                ) AS BIGINT)) AS BIGINT) AS s
              FROM base GROUP BY doc_id),
            tfidf AS (
              SELECT doc_id, CAST(SUM(tf * idf_micro) AS BIGINT) AS s
              FROM base GROUP BY doc_id),
            ra AS (SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS ra
                   FROM bm25),
            rb AS (SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rb
                   FROM tfidf),
            j AS (SELECT doc_id, ra, rb FROM ra JOIN rb USING (doc_id)
                  WHERE ra <= 10 OR rb <= 10),
            depths(depth, w_nano) AS (VALUES
              (1, 100000000), (2, 90000000), (3, 81000000), (4, 72900000),
              (5, 65610000), (6, 59049000), (7, 53144100), (8, 47829690),
              (9, 43046721), (10, 38742048)),
            counts AS (
              SELECT depth, w_nano, COUNT(*) AS n_overlap
              FROM j CROSS JOIN depths
              WHERE ra <= depth AND rb <= depth
              GROUP BY 1, 2),
            t AS (
              SELECT CAST(d.depth AS BIGINT) AS depth,
                CAST(COALESCE(c.n_overlap, 0) AS BIGINT) AS n_overlap,
                CAST(CAST(d.w_nano AS BIGINT) * COALESCE(c.n_overlap, 0)
                  * 1000000 // d.depth AS BIGINT) AS contrib_femto
              FROM depths d LEFT JOIN counts c
                ON d.depth = c.depth AND d.w_nano = c.w_nano)
            SELECT depth, n_overlap, contrib_femto,
              CAST(FLOOR(CAST(SUM(contrib_femto) OVER () AS DOUBLE)
                / 1000000000000000.0 * 1000000.0) AS DOUBLE) / 1000000.0 AS rbo
            FROM t ORDER BY depth""")
  )

  // --------------------------------------------------------------- q215
  /** Centroid-outlier audit: the 20 vectors LEAST aligned with their own
    * label's centroid — the per-vector actionable complement to q144's
    * NN histogram and q194's anisotropy: a low cosine to the label
    * centroid flags probable mislabels and corrupt embeddings before
    * they poison an IVF router (q38/q173) or a hard-negative miner
    * (q96). Cosine's scale invariance means the centroid MEAN is never
    * computed — cos(x, mean_l) = cos(x, sum_l) — and with micro-floored
    * components (q173's contract) both the per-label SUM vectors and
    * the per-vector dot/norm are exact DECIMAL(38,0)/HUGEINT integer
    * arithmetic with ONE double conversion + ffloor at the end (q185's
    * discipline). Each vector is included in its own label sum (the
    * standard convention; at corpus scale the self-term is negligible
    * and excluding it would cost a per-vector centroid variant).
    *
    * Scale shape: two corpus passes (q194's contract) — one posexplode
    * aggregate to the |labels|·dim summary, one scoring pass joining
    * components against that BROADCAST summary into a vec_id-keyed
    * aggregate — then a TakeOrdered(20). Zero-norm vectors are excluded
    * (no direction, no alignment).
    */
  val q215 = QuerySpec(
    "q215_centroid_outliers",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      def comps(df: DataFrame) = df
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("xm"))
      val e = Tables.embeddings(s, d)
      val labelSums = graft.core.Materialize(
        comps(e).groupBy("label", "dim")
          .agg(sum("xm").cast("long").as("sv")))
      val labelNorms = labelSums.groupBy("label")
        .agg(sum(col("sv").cast(dec) * col("sv").cast(dec)).as("nb"))
      comps(e)
        .join(broadcast(labelSums), Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(sum(col("xm").cast(dec) * col("sv").cast(dec)).as("dot"),
          sum(col("xm").cast(dec) * col("xm").cast(dec)).as("na"))
        .join(broadcast(labelNorms), "label")
        .filter(col("na") > 0 && col("nb") > 0)
        .select(col("label"), col("vec_id"),
          ffloor(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
            .as("cos_centroid"))
        .orderBy(col("cos_centroid"), col("vec_id"))
        .limit(20)
    },
    Some("""WITH comps AS (
              SELECT vec_id, label, i - 1 AS dim,
                CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
                  AS xm
              FROM (SELECT vec_id, label, embedding,
                      unnest(range(1, len(embedding) + 1)) AS i
                    FROM embeddings)),
            ls AS (
              SELECT label, dim, CAST(SUM(xm) AS BIGINT) AS sv
              FROM comps GROUP BY 1, 2),
            ln AS (
              SELECT label, SUM(CAST(sv AS HUGEINT) * sv) AS nb
              FROM ls GROUP BY 1),
            per AS (
              SELECT c.vec_id, c.label,
                SUM(CAST(c.xm AS HUGEINT) * s.sv) AS dot,
                SUM(CAST(c.xm AS HUGEINT) * c.xm) AS na
              FROM comps c JOIN ls s ON c.label = s.label AND c.dim = s.dim
              GROUP BY 1, 2)
            SELECT p.label, p.vec_id,
              CAST(FLOOR(CAST(dot AS DOUBLE) /
                (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)))
                * 1000000.0) AS DOUBLE) / 1000000.0 AS cos_centroid
            FROM per p JOIN ln USING (label)
            WHERE na > 0 AND nb > 0
            ORDER BY cos_centroid, vec_id LIMIT 20""")
  )

  val all: Seq[QuerySpec] = Seq(q209, q210, q211, q215)
}
