package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Ops.{asciiLower, asciiLowerSql, fanOut}

/** Persisted HEAVY-HITTERS store — the [[CardinalityStore]] idiom for
  * "what are the K most frequent terms so far": O(K) state regardless of
  * corpus size, incremented per batch, never rescanning the lake. The
  * per-batch summary is the batch's EXACT term counts (vocab-bounded,
  * like every tf aggregate in this repo — the corpus-cardinality sketch
  * path is q106's [[graft.functions.FreqSketchAgg]]); the store then
  * applies the Misra–Gries rank-(K+1) reduction, so what persists is a
  * K-counter MG summary with the standard guarantee: every term with
  * true count > N/(K+1) holds a counter, and counters undercount by at
  * most N/(K+1) (Misra–Gries 1982; merge bound Agarwal et al. PODS'12).
  *
  * The reduction is RELATIONAL (a window over ≤ K + |batch vocab| rows +
  * one subtraction) — which is what makes the whole store DuckDB-
  * replayable: [[q212]] oracle-checks the exact counter table after a
  * warm increment, not just invariant booleans.
  *
  * Idempotence: MG counter addition is NOT idempotent (replaying a batch
  * double-counts), so unlike [[VocabStore]] the streaming twin must
  * deduplicate epochs — `update` records `last_epoch` in meta and
  * ignores batches with epoch ≤ last_epoch, the standard transactional
  * `foreachBatch` pattern (epoch ids are monotone per query). Batch
  * callers that replay must pass epochs; ad-hoc callers pass none and
  * own their delivery semantics.
  *
  * Store layout: `state/counters.parquet` (term, c) ≤ K rows;
  * `state/meta.parquet` (n_total, last_epoch) — both files committed as
  * ONE atomic [[StoreCommit]] directory rename, so a crash can never
  * land counters including a batch next to a stale `last_epoch` (the
  * torn-commit window that would let an at-least-once replay pass the
  * epoch guard and double-count).
  */
object TopKStore {

  val K = 8

  private[llmops] def termCounts(docs: DataFrame): DataFrame =
    fanOut(docs)
      .select(explode(split(asciiLower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))

  /** Misra–Gries rank-(k+1) reduction: subtract the (k+1)-th largest
    * counter value from every counter, drop the non-positive — at most k
    * survive, each having absorbed bounded undercount. Only the value at
    * rank k+1 is needed — a SELECTION, not a ranking — so it is computed
    * as the minimum `c` of the top-(k+1) rows under `(c desc, term)`:
    * `orderBy(...).limit(k+1)` plans as TakeOrderedAndProject
    * (per-partition size-(k+1) heaps merged once), never a
    * single-partition WindowExec sort of the batch vocabulary. The
    * selected value is order-deterministic even under count ties (the
    * sorted value sequence does not depend on the tiebreak); when fewer
    * than k+1 counters exist the subtrahend is 0, matching the rank
    * semantics (no rank-(k+1) row → subtract nothing).
    */
  private[llmops] def mgReduce(counts: DataFrame, k: Int): DataFrame = {
    val kth = counts.orderBy(col("c").desc, col("term")).limit(k + 1)
      .agg(when(count(lit(1)) === k + 1, min(col("c")))
        .otherwise(lit(0L)).cast("long").as("sub"))
    counts.crossJoin(broadcast(kth))
      .select(col("term"), (col("c") - col("sub")).as("c"))
      .filter(col("c") > 0)
  }

  /** Committed counter table (rolls forward a crashed commit first). */
  def counters(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${StoreCommit.resolve(spark, dir)}/counters.parquet")

  /** The counter table the store WOULD hold after `batch` lands (pure
    * form): stored counters + batch exact counts, summed per term, MG-
    * reduced back to ≤ K. O(K + batch vocab); the lake is never reread.
    */
  def updatedCounters(spark: SparkSession, dir: String, batch: DataFrame): DataFrame = {
    val merged = counters(spark, dir).unionByName(termCounts(batch))
      .groupBy("term").agg(sum("c").cast("long").as("c"))
    mgReduce(merged, K)
  }

  def build(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val stage = StoreCommit.stagePath(dir)
    mgReduce(termCounts(docs), K)
      .write.mode("overwrite").parquet(s"$stage/counters.parquet")
    spark.createDataFrame(Seq(
        (tokenTotal(docs), -1L)))
      .toDF("n_total", "last_epoch")
      .write.mode("overwrite").parquet(s"$stage/meta.parquet")
    StoreCommit.commit(spark, dir)
  }

  private def tokenTotal(docs: DataFrame): Long =
    termCounts(docs).agg(sum("c")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

  /** Committing increment. `epoch` ≥ 0 enables replay protection: a
    * batch whose epoch ≤ the stored `last_epoch` is a no-op (the
    * at-least-once `foreachBatch` contract — MG addition is not
    * idempotent, so the store must refuse duplicates itself).
    */
  def update(spark: SparkSession, dir: String, batch: DataFrame,
             epoch: Long = -1L): Unit = {
    val state = StoreCommit.resolve(spark, dir)
    val meta = spark.read.parquet(s"$state/meta.parquet").collect()(0)
    val (nTotal, lastEpoch) = (meta.getLong(0), meta.getLong(1))
    if (epoch >= 0 && epoch <= lastEpoch) return
    val stage = StoreCommit.stagePath(dir)
    updatedCounters(spark, dir, batch)
      .write.mode("overwrite").parquet(s"$stage/counters.parquet")
    spark.createDataFrame(Seq((nTotal + tokenTotal(batch),
        if (epoch >= 0) epoch else lastEpoch)))
      .toDF("n_total", "last_epoch")
      .write.mode("overwrite").parquet(s"$stage/meta.parquet")
    StoreCommit.commit(spark, dir)
  }

  /** The candidate set for an exact recount (q106's two-pass composition:
    * MG candidates are a superset of every > N/(K+1) heavy hitter in any
    * merge order; recount them exactly against the batch/corpus when
    * order-independent COUNTS are needed, not just membership).
    */
  def candidates(spark: SparkSession, dir: String): DataFrame =
    counters(spark, dir).select("term")

  /** STREAMING twin — `foreachBatch` merge with the epoch guard wired to
    * the micro-batch id, making at-least-once delivery safe (a replayed
    * micro-batch is a store no-op). State lives in the store; the query
    * itself is stateless.
    */
  def stream(docs: DataFrame, dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty) update(batch.sparkSession, dir, batch, epoch)
      }

  // ------------------------------------------------------------- store dir
  private val builtFor = scala.collection.concurrent.TrieMap.empty[String, String]
  private def storeDir(s: SparkSession, d: String): String =
    builtFor.getOrElseUpdate(d, {
      val dir = graft.core.TempDirs.scratch("graft-topkstore-")
      build(Tables.documents(s, d).filter(col("doc_id") % 2 === 0), dir)
      dir
    })

  // --------------------------------------------------------------- q212
  /** Warm-increment heavy-hitters audit — [[q201]]'s shape for the MG
    * store, made fully hash-checkable by the store's relational
    * construction: the store holds the even-doc reduction, the odd docs
    * land as the increment, and DuckDB REPLAYS the identical two-step
    * (even counts → rank-9 subtract → merge odd counts → rank-9
    * subtract), so the complete counter table — not merely invariant
    * booleans — must match bit-for-bit. Each row also carries its exact
    * corpus count and the MG bound check as integers
    * ((K+1)·undercount ≤ N — cross-multiplied, no division), plus the
    * coverage invariant (every term with (K+1)·exact > N holds a
    * counter) as a 1-row cross-joined boolean both engines compute from
    * their own side.
    */
  val q212 = QuerySpec(
    "q212_topk_store_audit",
    (s, d) => {
      val warm = updatedCounters(s, storeDir(s, d),
        Tables.documents(s, d).filter(col("doc_id") % 2 === 1))
      val exact = termCounts(Tables.documents(s, d))
      val n = exact.agg(sum("c").cast("long").as("n"))
      val heavyMissing = exact.crossJoin(broadcast(n))
        .filter(col("c") * (K + 1) > col("n"))
        .join(warm.select("term"), Seq("term"), "left_anti")
      warm.select(col("term"), col("c").as("c_store"))
        .join(exact.select(col("term"), col("c").as("c_exact")), "term")
        .crossJoin(broadcast(n))
        .select(col("term"), col("c_store"), col("c_exact"),
          (col("c_exact") - col("c_store")).as("undercount"),
          ((col("c_exact") - col("c_store")) * (K + 1) <= col("n")).as("within_bound"))
        .crossJoin(broadcast(
          heavyMissing.agg((count(lit(1)) === 0).as("heavy_covered"))))
        .orderBy(col("c_store").desc, col("term"))
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, t.term FROM documents,
                unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t(term)
              WHERE t.term <> ''),
            even AS (SELECT term, COUNT(*) AS c FROM toks
                     WHERE doc_id % 2 = 0 GROUP BY 1),
            r1 AS (SELECT term, c,
                     ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rn FROM even),
            s1 AS (SELECT COALESCE((SELECT c FROM r1 WHERE rn = ${K + 1}), 0) AS sub),
            st1 AS (SELECT term, c - sub AS c FROM r1 CROSS JOIN s1
                    WHERE c - sub > 0),
            odd AS (SELECT term, COUNT(*) AS c FROM toks
                    WHERE doc_id % 2 = 1 GROUP BY 1),
            u AS (SELECT term, CAST(SUM(c) AS BIGINT) AS c FROM
                    (SELECT * FROM st1 UNION ALL SELECT * FROM odd)
                  GROUP BY 1),
            r2 AS (SELECT term, c,
                     ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rn FROM u),
            s2 AS (SELECT COALESCE((SELECT c FROM r2 WHERE rn = ${K + 1}), 0) AS sub),
            warm AS (SELECT term, c - sub AS c FROM r2 CROSS JOIN s2
                     WHERE c - sub > 0),
            exact AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
            hm AS (
              SELECT COUNT(*) = 0 AS heavy_covered
              FROM exact CROSS JOIN n
              WHERE c * ${K + 1} > n
                AND term NOT IN (SELECT term FROM warm))
            SELECT w.term, CAST(w.c AS BIGINT) AS c_store,
              CAST(e.c AS BIGINT) AS c_exact,
              CAST(e.c - w.c AS BIGINT) AS undercount,
              (e.c - w.c) * ${K + 1} <= n AS within_bound,
              heavy_covered
            FROM warm w JOIN exact e USING (term)
            CROSS JOIN n CROSS JOIN hm
            ORDER BY c_store DESC, term""")
  )

  val all: Seq[QuerySpec] = Seq(q212)
}
