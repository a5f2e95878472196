package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops.{asciiLower, asciiLowerSql, fanOut, ffloor}

/** Shard-placement and corpus-frontier operators — the planning layer a
  * 100 TB pipeline runs when it RESIZES (how much data moves when the
  * shard count changes), GROWS (how fast the vocabulary curve bends —
  * Heaps' law — which sizes tokenizers and dedup stores), and SELECTS
  * (which documents are Pareto-optimal under competing criteria, without
  * an all-pairs dominance join).
  *
  * The reference has no query surface at all (its sink writes objects and
  * cannot read them back — `OSSStorage.java:73-75`); these follow the
  * repo's q47/q99 hashing and q127 profiling conventions. All three are
  * scan + keyed-aggregate plans: no corpus-wide window, no driver collect,
  * no pair join.
  */
object ShardOps {

  // --------------------------------------------------------------- q198
  /** RENDEZVOUS (highest-random-weight) shard-churn audit — the resize
    * question for any sharded corpus store: growing 16 → 20 shards, what
    * fraction of documents must MOVE? HRW assigns each doc to
    * `argmax_s md5(doc_id | s)`, so a doc moves only when one of the four
    * NEW shards wins its per-doc tournament — expected churn is 4/20 =
    * 20%, the theoretical minimum — while `doc_id mod S` reassigns nearly
    * everything (only doc_id ≡ same residue mod lcm(16,20) stays). The
    * audit computes BOTH assignments at both sizes and reports the two
    * churn fractions side by side; the gap is the case for HRW placement
    * in the shard manifest (q99's epoch shuffle keys the same md5 family).
    *
    * Scale shape: pure per-row expression work (36 md5s per doc, all
    * codegen'd — no UDF) folded by ONE corpus aggregate; output is a
    * single row. Nothing shuffles but the final partial-agg merge.
    * Determinism: md5 hex compares lexicographically and identically in
    * Spark and DuckDB; ties are md5 collisions (none at any SF).
    */
  private def hrwShard(nShards: Int) = {
    val cands = (0 until nShards).map { s =>
      struct(
        md5(concat(col("doc_id").cast("string"), lit("|"), lit(s.toString))).as("h"),
        lit(s.toLong).as("s"))
    }
    array_max(array(cands: _*)).getField("s")
  }

  val q198 = QuerySpec(
    "q198_rendezvous_sharding",
    (s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      docs
        .select(
          hrwShard(16).as("hrw16"), hrwShard(20).as("hrw20"),
          (col("doc_id") % 16).as("mod16"), (col("doc_id") % 20).as("mod20"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("hrw16") =!= col("hrw20"), 1)).as("hrw_moved"),
          count(when(col("mod16") =!= col("mod20"), 1)).as("mod_moved"))
        .select(col("n_docs"), col("hrw_moved"), col("mod_moved"),
          ffloor(col("hrw_moved").cast("double") / col("n_docs"), 4).as("hrw_churn"),
          ffloor(col("mod_moved").cast("double") / col("n_docs"), 4).as("mod_churn"))
    },
    Some("""WITH a AS (
              SELECT d.doc_id,
                arg_max(g.s, md5(CAST(d.doc_id AS VARCHAR) || '|' || CAST(g.s AS VARCHAR)))
                  FILTER (WHERE g.s < 16) AS hrw16,
                arg_max(g.s, md5(CAST(d.doc_id AS VARCHAR) || '|' || CAST(g.s AS VARCHAR))) AS hrw20,
                d.doc_id % 16 AS mod16, d.doc_id % 20 AS mod20
              FROM documents d, (SELECT unnest(range(20)) AS s) g
              GROUP BY d.doc_id)
            SELECT COUNT(*) AS n_docs,
              COUNT(*) FILTER (WHERE hrw16 <> hrw20) AS hrw_moved,
              COUNT(*) FILTER (WHERE mod16 <> mod20) AS mod_moved,
              CAST(FLOOR(CAST(COUNT(*) FILTER (WHERE hrw16 <> hrw20) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS hrw_churn,
              CAST(FLOOR(CAST(COUNT(*) FILTER (WHERE mod16 <> mod20) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS mod_churn
            FROM a""")
  )

  // --------------------------------------------------------------- q199
  /** VOCABULARY GROWTH curve (Heaps' law) — cumulative distinct terms vs
    * cumulative tokens across ten equal doc_id strata of the corpus. The
    * curve's bend is what sizes a tokenizer's vocab, a dedup store's key
    * space, and the marginal value of the next 10 TB of crawl (a
    * flattening curve means new data repeats the old vocabulary).
    *
    * Scale shape: "cumulative distinct" does NOT need a corpus-ordered
    * window — a term enters the vocabulary exactly once, at
    * `min(doc_id)`, so ONE term-keyed aggregate (the same shuffle as
    * q55's df) yields each term's entry bucket; per-bucket token counts
    * ride the tokenize pass's partial aggregation. The running sums then
    * run over the TEN-row bucket table (a deliberately tiny single-
    * partition window, q127's decile convention). Bucket boundaries are
    * exact integer arithmetic on doc_id against the broadcast scalar
    * max+1 — no ntile, no sort of the corpus.
    */
  val q199 = QuerySpec(
    "q199_vocab_growth",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val hi = docs.agg((max("doc_id") + 1).cast("long").as("hi"))
      // ONE tokenize pass (the q165 lesson): collapse the token stream to
      // the (bucket, term) grain first — Materialized, it feeds both the
      // per-bucket token count and the first-bucket-per-term aggregate,
      // and at |vocab × 10| rows it is far smaller than the raw stream.
      val tf = graft.core.Materialize(fanOut(docs)
        .select(col("doc_id"), explode(split(asciiLower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .crossJoin(broadcast(hi))
        // integer division: (doc_id * 10) div hi — exact in both engines
        .select(col("term"),
          expr("(doc_id * 10) div hi").cast("long").as("bucket"))
        .groupBy("bucket", "term").agg(count(lit(1)).as("c")))
      val tokCount = tf.groupBy("bucket").agg(sum("c").cast("long").as("toks"))
      val newTerms = tf.groupBy("term").agg(min("bucket").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("new_terms"))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokCount.join(newTerms, Seq("bucket"), "full")
        .select(col("bucket"),
          coalesce(col("toks"), lit(0L)).as("toks"),
          coalesce(col("new_terms"), lit(0L)).as("new_terms"))
        .select(col("bucket"),
          sum("toks").over(w).cast("long").as("cum_tokens"),
          sum("new_terms").over(w).cast("long").as("cum_vocab"))
        .orderBy("bucket")
    },
    Some(s"""WITH hi AS (SELECT MAX(doc_id) + 1 AS hi FROM documents),
            toks AS (
              SELECT CAST((doc_id * 10) // hi.hi AS BIGINT) AS bucket, t.term
              FROM documents, hi,
                unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t(term)
              WHERE t.term <> ''),
            tc AS (SELECT bucket, COUNT(*) AS toks FROM toks GROUP BY bucket),
            nt AS (SELECT bucket, COUNT(*) AS new_terms FROM (
                     SELECT term, MIN(bucket) AS bucket FROM toks GROUP BY term)
                   GROUP BY bucket),
            j AS (SELECT COALESCE(tc.bucket, nt.bucket) AS bucket,
                    COALESCE(toks, 0) AS toks, COALESCE(new_terms, 0) AS new_terms
                  FROM tc FULL OUTER JOIN nt ON tc.bucket = nt.bucket)
            SELECT bucket,
              CAST(SUM(toks) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
              CAST(SUM(new_terms) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
            FROM j ORDER BY bucket""")
  )

  // --------------------------------------------------------------- q200
  /** PARETO FRONT document selection — the docs no other doc dominates on
    * (MINIMIZE n_tokens, MAXIMIZE distinct terms): the "densest novel
    * vocabulary per token" shortlist a curation pass uses when no single
    * score exists — short docs packed with unseen terms beat long
    * repetitive ones, and the two axes genuinely compete (a front of 16
    * points at sf0.01; maximizing correlated axes like chars×tokens
    * degenerates to one point). Dominance: d' dominates d iff
    * n_tokens' ≤ n_tokens, distinct' ≥ distinct, one strict.
    *
    * Scale shape — the point of the operator: the naive plan is an
    * all-pairs dominance anti-join (quadratic — the batch analog of the
    * BroadcastNestedLoop trap). Instead: (1) ONE keyed aggregate
    * collapses the corpus to `max(distinct)` per n_tokens value — a
    * table bounded by the length domain, not the corpus; (2) the classic
    * sweep — a point is on the front iff its y beats every y at strictly
    * SMALLER x — is a running-max window over that SMALL table (rows
    * frame, 1 PRECEDING, so equal-y at smaller x correctly dominates);
    * (3) one keyed join back tags the winning documents (ties on both
    * axes are all on the front). Corpus cost: one tokenize-free scalar
    * projection (array_distinct on the split — no explode), one
    * aggregate + one join, both keyed on n_tokens.
    */
  val q200 = QuerySpec(
    "q200_pareto_front",
    (s, d) => {
      val toks = filter(split(asciiLower(col("text")), " "),
        t => t =!= "")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"))
      val perX = docs.groupBy("n_tokens").agg(max("n_distinct").as("best_y"))
      val w = Window.orderBy(col("n_tokens").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val front = perX
        .withColumn("m1", max("best_y").over(w))
        .filter(col("m1").isNull || col("best_y") > col("m1"))
        // renamed join keys: front derives from docs, so qualified names
        // alone would be ambiguous in the join back
        .select(col("n_tokens").as("fx"), col("best_y").as("fy"))
      docs.join(front,
          col("n_tokens") === col("fx") && col("n_distinct") === col("fy"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"))
        .orderBy(col("n_tokens").asc, col("doc_id"))
    },
    Some(s"""WITH d AS (
              SELECT doc_id,
                CAST(len(list_filter(string_split(${asciiLowerSql("text")}, ' '),
                  t -> t <> '')) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(list_filter(
                  string_split(${asciiLowerSql("text")}, ' '),
                  t -> t <> ''))) AS BIGINT) AS n_distinct
              FROM documents),
            per_x AS (SELECT n_tokens, MAX(n_distinct) AS best_y
                      FROM d GROUP BY n_tokens),
            sweep AS (
              SELECT n_tokens, best_y,
                MAX(best_y) OVER (ORDER BY n_tokens ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
              FROM per_x),
            front AS (SELECT n_tokens, best_y FROM sweep
                      WHERE m1 IS NULL OR best_y > m1)
            SELECT d.doc_id, d.n_tokens, d.n_distinct
            FROM d JOIN front ON d.n_tokens = front.n_tokens
                              AND d.n_distinct = front.best_y
            ORDER BY d.n_tokens ASC, d.doc_id""")
  )

  val all: Seq[QuerySpec] = Seq(q198, q199, q200)
}
