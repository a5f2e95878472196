package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import graft.operators.Ops.ffloor

/** Similarity search over an `Array[Float]` embedding column.
  *
  * Two paths, mirroring production ANN systems:
  *   - brute-force cosine top-k (q29): exact, O(|Q|·|C|) — the correctness
  *     baseline, and the right plan when |Q| is small (the query side is
  *     broadcast; candidates stream through executors, never collected).
  *   - LSH-bucketed (q32) / IVF ([[ivfTopK]]): sub-linear candidate
  *     generation for the 100 TB path — candidates come from an equi-join
  *     on bucket/centroid id, so the shuffle is keyed and bounded.
  *
  * All arithmetic is done in double precision with a strict left-to-right
  * fold (`aggregate`), which makes the score bit-deterministic and lets the
  * brute-force query be DuckDB-oracled (`list_reduce` folds the same way).
  */
object Similarity {

  /** Strict left-fold dot product of two float-array columns in double —
    * a native codegen expression ([[graft.functions.FloatVectorDot]]);
    * bit-identical to `aggregate(zip_with(...))` and to the DuckDB
    * oracle's `list_reduce` fold, but without the per-row intermediate
    * array.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine from a precomputed dot product and norms — the overload for
    * plans that materialize per-vector norms once before a pairwise join.
    * Zero-norm vectors yield NULL (not an ANSI divide-by-zero error) —
    * degenerate embeddings exist in real corpora and must not kill the
    * query; NULL sorts last under `desc_nulls_last` ranking.
    */
  def cosineFromParts(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / nullif(normA * normB, lit(0.0))

  /** Cosine computed from scratch (norms per pair) — for one-shot pair
    * scoring; pairwise plans should precompute norms and use
    * [[cosineFromParts]].
    */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), norm(a), norm(b))

  /** Exact brute-force cosine top-k: for each query vector, rank all
    * candidates. Query side is tiny → `broadcast`; the candidate scan is
    * embarrassingly parallel; the only shuffle is the per-query top-k
    * (window over qid — |Q| partitions).
    *
    * Callers attach a `.limit(|Q|)` CARDINALITY WITNESS to the query side
    * (their key filters select ≤ |Q| rows by vec_id uniqueness, so the
    * limit is a semantic no-op): it makes the broadcast side's bound a
    * planner-visible fact [[graft.plans.PlanGate]] enforces mechanically,
    * instead of a scaladoc promise.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // norms are precomputed per VECTOR (O(|Q|+|C|)) before the join, not
    // per pair (O(|Q|·|C|)) — at scale this is the difference between one
    // narrow pass and recomputing the candidate norm once per query
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      norm(col("embedding")).as("qn"))
    val c = candidates.select(col("vec_id"), col("embedding").as("ce"),
      norm(col("embedding")).as("cn"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_raw").desc_nulls_last, col("vec_id"))
    broadcast(q).join(c, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosineFromParts(dot(col("qe"), col("ce")), col("qn"), col("cn"))
          .as("cos_raw"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), graft.operators.Ops.ffloor(col("cos_raw"), 4).as("cos"))
      .orderBy("qid", "rn")
  }

  // ---------------------------------------------------------------- q29
  val q29 = QuerySpec(
    "q29_embedding_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      bruteForceTopK(e.filter(col("vec_id") < 3).limit(3), e, k = 10)
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 3),
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
              FROM q, (SELECT vec_id, embedding AS ee FROM embeddings)
              WHERE vec_id <> qid)
            SELECT qid, rn, vec_id, cos FROM (
              SELECT qid, vec_id,
                CAST(FLOOR(dot / NULLIF(SQRT(nq) * SQRT(nc), 0.0) * 10000.0) AS DOUBLE) / 10000.0 AS cos,
                ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY dot / NULLIF(SQRT(nq) * SQRT(nc), 0.0)
                    DESC NULLS LAST, vec_id) AS rn
              FROM s)
            WHERE rn <= 10 ORDER BY qid, rn""")
  )

  // ------------------------------------------------------ LSH (hyperplane)
  /** Deterministic pseudo-random unit-free hyperplanes (seeded). */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Random-hyperplane signature: `nBits`-bit bucket id per vector. Sign of
    * the dot product with each seeded hyperplane → one bit. Vectors in the
    * same bucket are cosine-close with high probability.
    *
    * Implemented as a typed `mapPartitions` (preference-order (d), SURVEY
    * §2.7) deliberately: nBits fold-expressions over 64-wide arrays blew
    * the expression tree up to seconds of codegen *compilation* for
    * milliseconds of actual math. Dense fixed-width linear algebra is the
    * one place the JVM loop beats Catalyst; the planes matrix ships to
    * executors as a closure constant (broadcast-sized).
    */
  def lshBuckets(vectors: DataFrame, nBits: Int = 12, dim: Int = 64,
                 seed: Long = 42L): DataFrame = {
    val planes: Array[Array[Double]] = hyperplanes(nBits, dim, seed).map(_.toArray).toArray
    val spark = vectors.sparkSession
    import spark.implicits._
    val withBucket = vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, emb) =>
          var bucket = 0L
          var i = 0
          while (i < planes.length) {
            val p = planes(i)
            var s = 0.0
            var j = 0
            val n = math.min(p.length, emb.length)
            while (j < n) { s += emb(j) * p(j); j += 1 }
            if (s > 0) bucket |= 1L << i
            i += 1
          }
          (id, emb, bucket)
        }
      }
      .toDF("vec_id", "embedding", "bucket")
    withBucket
  }

  /** q32: LSH near-dup pairs — bucket equi-join candidates, exact cosine
    * verify ≥ minCos. Rows-only check (seeded hyperplanes aren't
    * SQL-expressible). At scale: shuffle key = bucket id; candidate count
    * is sum of per-bucket squares, controlled by nBits. Norms are
    * computed ONCE per row in the materialized bucket table
    * ([[cosineFromParts]], q141's discipline) — per-pair `cosine()` would
    * pay 3 dot products per candidate, tripling the verify cost of every
    * dense bucket for bit-identical scores (same fold, same values).
    */
  def lshNearDupPairs(vectors: DataFrame, minCos: Double, nBits: Int = 12,
                      auditOnly: Boolean = false): DataFrame = {
    // nBits = 0 collapses every vector into ONE bucket: the candidate
    // join is all-pairs QUADRATIC. That config exists solely for the
    // q244/q245 exactness audits (one bucket ⇒ pair list provably equals
    // the exact cosine range search) and must be unreachable by accident
    // on a lake-scale table — callers opt in with auditOnly = true
    // (round-9 verdict item 3).
    require(nBits > 0 || auditOnly,
      "lshNearDupPairs: nBits = 0 is the all-pairs audit configuration " +
        "(quadratic candidate join); pass auditOnly = true on a bounded " +
        "fixture to use it")
    // eager materialization: the bucket table feeds both self-join sides;
    // without it the mapPartitions signature pass runs twice (Materialize
    // holds the local-vs-cluster failure-tolerance contract)
    val b = graft.core.Materialize(
      lshBuckets(vectors, nBits).withColumn("nrm", norm(col("embedding"))))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"),
        graft.operators.Ops.ffloor(cosineFromParts(
          dot(col("x.embedding"), col("y.embedding")),
          col("x.nrm"), col("y.nrm")), 4).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy("v1", "v2")
  }

  val q32 = QuerySpec(
    "q32_embedding_lsh_neardup",
    (s, d) => lshNearDupPairs(Tables.embeddings(s, d), minCos = 0.2, nBits = 8),
    None
  )

  // ----------------------------------------------------------------- IVF
  /** IVF-style ANN: assign every vector to its nearest of `centroids`
    * (a broadcast-size list), then search only the query's probe cells.
    * This is the scale path: the candidate join is an equi-join on cell id.
    * Centroids would come from a sampled k-means at 100 TB; here they are
    * taken as the first vectors (deterministic). Assignment is a typed
    * mapPartitions for the same reason as [[lshBuckets]] (dense fixed-width
    * math; centroid matrix ships as a closure constant).
    */
  def ivfAssign(vectors: DataFrame, centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    val cents: Array[(Long, Array[Double], Double)] = centroids
      .map { case (cid, v) => (cid, v.toArray, math.sqrt(v.map(x => x * x).sum)) }
      .sortBy(_._1).toArray
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, emb) =>
          var n = 0.0
          emb.foreach(x => n += x.toDouble * x)
          val en = math.sqrt(n)
          var best = -2.0
          var bestC = -1L
          cents.foreach { case (cid, cv, cn) =>
            var s = 0.0
            var j = 0
            val m = math.min(cv.length, emb.length)
            while (j < m) { s += emb(j) * cv(j); j += 1 }
            val cos = s / (en * cn + 1e-12)
            if (cos > best) { best = cos; bestC = cid }
          }
          (id, emb, bestC)
        }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Probe cells for queries: each vector → its `nprobe` nearest centroid
    * cells, exploded to (vec_id, embedding, cell) — multi-probe IVF, the
    * standard recall lever when cells are coarse.
    */
  def ivfProbe(vectors: DataFrame, centroids: Seq[(Long, Seq[Double])], nprobe: Int): DataFrame = {
    val cents: Array[(Long, Array[Double], Double)] = centroids
      .map { case (cid, v) => (cid, v.toArray, math.sqrt(v.map(x => x * x).sum)) }
      .sortBy(_._1).toArray
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, emb) =>
          var n = 0.0
          emb.foreach(x => n += x.toDouble * x)
          val en = math.sqrt(n)
          cents.map { case (cid, cv, cn) =>
            var s = 0.0
            var j = 0
            val m = math.min(cv.length, emb.length)
            while (j < m) { s += emb(j) * cv(j); j += 1 }
            (s / (en * cn + 1e-12), cid)
          }.sortBy(-_._1).take(nprobe).map { case (_, cid) => (id, emb, cid) }
        }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Sampled Lloyd k-means for IVF centroid training — the 100 TB path:
    * membership in the training sample is content-addressed
    * (`xxhash64(vec_id) % sampleMod == 0`, the same engine- and
    * partitioning-independent idiom as CorpusPipeline's split sampling),
    * so WHICH vectors train the index never depends on file layout. (The
    * floating-point centroid means still sum in partition order — double
    * addition is not associative — so centroids are deterministic for a
    * fixed layout + seed, not bit-stable across re-layouts; acceptable
    * for an index whose queries re-rank by exact cosine anyway.)
    *
    * Each Lloyd iteration is ONE assignment pass ([[ivfAssign]]'s dense
    * mapPartitions math) + ONE distributed mean: per-partition partial
    * (cell, count, per-dim sums) rows — k rows per partition, NOT an
    * n×dim explode of the sample — exploded to (cell, pos) grain and
    * reduced by a single aggregate (each partial row contributes its
    * count exactly once per pos, so sum(n) per (cell, pos) is the cell
    * total — no second pass, no join). Only the final k×dim centroid
    * matrix is collected (broadcast-sized by construction). Empty cells
    * keep their previous centroid.
    */
  def kmeansCentroids(vectors: DataFrame, k: Int, iters: Int = 3,
                      sampleMod: Int = 1, seed: Long = 42L): Seq[(Long, Seq[Double])] = {
    require(k >= 1 && iters >= 0 && sampleMod >= 1)
    val spark = vectors.sparkSession
    import spark.implicits._
    val sample = (if (sampleMod <= 1) vectors
      else vectors.filter(pmod(xxhash64(col("vec_id"), lit(seed)), lit(sampleMod)) === 0))
      .select(col("vec_id"), col("embedding"))
    var cents: Seq[(Long, Seq[Double])] = sample
      .withColumn("__h", xxhash64(col("vec_id"), lit(seed)))
      .orderBy("__h", "vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1).map(_.toDouble).toSeq) }
      .toSeq
    for (_ <- 0 until iters) {
      val centArr = cents // stable closure capture for this iteration
      val partials = ivfAssign(sample, centArr)
        .select(col("cell"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val sums = scala.collection.mutable.Map.empty[Long, (Array[Double], Long)]
          it.foreach { case (cell, emb) =>
            val (s, _) = sums.getOrElseUpdate(cell, (new Array[Double](emb.length), 0L))
            var j = 0
            while (j < emb.length && j < s.length) { s(j) += emb(j); j += 1 }
            sums(cell) = (s, sums(cell)._2 + 1)
          }
          sums.iterator.map { case (cell, (s, n)) => (cell, n, s.toSeq) }
        }
        .toDF("cell", "n", "sums")
      val means = partials
        .select(col("cell"), col("n"), posexplode(col("sums")).as(Seq("pos", "s")))
        .groupBy("cell", "pos")
        .agg((sum("s") / sum("n")).as("m"))
        .select(col("cell"), col("pos"), col("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** q38: IVF top-k — centroids from [[kmeansCentroids]] (k=8, 3 Lloyd
    * iterations, deterministic seeded init), 3-probe search, exact cosine
    * rank inside the probed cells. Rows-only check (the centroid
    * assignment isn't reasonably SQL-expressible); recall vs brute force
    * is asserted in ScalaTest.
    */
  /** IVF query phase against an existing index (trained inline by q38,
    * or loaded via [[loadIndex]]): multi-probe the queries to their
    * nprobe nearest cells, equi-join the cell-assigned corpus, exact
    * top-k within the probed cells.
    */
  def ivfQuery(centroids: Seq[(Long, Seq[Double])], assigned: DataFrame,
               queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val q = ivfProbe(queries, centroids, nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_raw").desc_nulls_last, col("vec_id"))
    broadcast(q)
      .join(assigned.select(col("vec_id"), col("embedding").as("ce"), col("cell")), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("qe"), col("ce")).as("cos_raw"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("rn"), col("vec_id"), graft.operators.Ops.ffloor(col("cos_raw"), 4).as("cos"))
      .orderBy("qid", "rn")
  }

  val q38 = QuerySpec(
    "q38_embedding_ivf_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val centroids = kmeansCentroids(e, k = 8, iters = 3)
      ivfQuery(centroids, ivfAssign(e, centroids),
        // .limit(3): cardinality witness (vec_id unique → ≤3 rows), the
        // same idiom as q195/q75 — proves the probe-side broadcast bound
        e.filter(col("vec_id").isin(100L, 101L, 102L)).limit(3), nprobe = 3, topK = 5)
    },
    None
  )

  // ------------------------------------------------- IVF index persistence
  /** A production ANN pipeline trains its index ONCE (a batch job over the
    * full corpus) and serves many query batches against it; training
    * per-query, as the self-contained q38 does for oracle purposes, would
    * re-scan 100 TB per lookup. These two functions split the phases:
    *
    *   - [[saveIndex]] persists centroids (k rows) AND per-vector cell
    *     assignments (the expensive full-corpus pass) as parquet.
    *   - [[loadIndex]] reads both back; queries then run [[ivfProbe]]
    *     against the loaded centroids and join the loaded assignments —
    *     no training, no corpus re-assignment.
    *
    * Determinism carries over: centroids are a pure function of
    * (corpus, k, iters, sampleMod, seed), so a rebuilt index bit-matches
    * the saved one, and query results over a loaded index equal the
    * train-inline path (asserted in SimilaritySpec).
    */
  def saveIndex(vectors: DataFrame, dir: String, k: Int, iters: Int = 3,
                sampleMod: Int = 1, seed: Long = 42L): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centroids = kmeansCentroids(vectors, k, iters, sampleMod, seed)
    centroids.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    ivfAssign(vectors, centroids)
      .write.mode("overwrite").parquet(s"$dir/assignments.parquet")
  }

  /** (centroids, assigned-vectors DataFrame) — see [[saveIndex]]. */
  def loadIndex(spark: SparkSession, dir: String): (Seq[(Long, Seq[Double])], DataFrame) = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids.parquet")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    (centroids, spark.read.parquet(s"$dir/assignments.parquet"))
  }

  // ---------------------------------------------------------------- q82
  /** q82: embedding-column AUDIT — the sanity pass an ANN/dedup job runs
    * before trusting 100 TB of vectors: per label, vector count, distinct
    * dimensionality (should be 1), zero-norm count (cosine is undefined
    * there; every scorer here guards it), norm extremes and a
    * decimal-exact norm sum. Narrow scan → one aggregate; all reported
    * doubles go through [[graft.operators.Ops.ffloor]]/decimal sums so
    * the oracle is bit-exact (norm itself is a left-to-right fold +
    * sqrt, the [[cosine]] determinism contract).
    */
  val q82 = QuerySpec(
    "q82_embedding_audit",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"),
          graft.functions.VectorFunctions.vec_norm(col("embedding")).as("norm"),
          size(col("embedding")).as("dim"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_vectors"),
          countDistinct("dim").as("n_dims"),
          count(when(col("norm") === 0.0, 1)).as("n_zero_norm"),
          graft.operators.Ops.ffloor(min("norm"), 4).as("min_norm"),
          graft.operators.Ops.ffloor(max("norm"), 4).as("max_norm"),
          graft.operators.Ops.dsum(col("norm")).as("sum_norm"))
        .orderBy("label"),
    Some("""WITH n AS (
              SELECT label,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                  (a, b) -> a + b)) AS norm,
                len(embedding) AS dim
              FROM embeddings)
            SELECT label, COUNT(*) AS n_vectors,
              COUNT(DISTINCT dim) AS n_dims,
              COUNT(CASE WHEN norm = 0.0 THEN 1 END) AS n_zero_norm,
              CAST(FLOOR(MIN(norm) * 10000.0) AS DOUBLE) / 10000.0 AS min_norm,
              CAST(FLOOR(MAX(norm) * 10000.0) AS DOUBLE) / 10000.0 AS max_norm,
              CAST(ROUND(SUM(CAST(norm AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_norm
            FROM n GROUP BY label ORDER BY label""")
  )

  // ------------------------------------------------------- k-NN labels
  /** q67: k-NN label assignment — classify held-out vectors by majority
    * label among their k nearest labeled neighbors (the label-propagation
    * / quality-classifier-by-neighbors pass of a curation pipeline).
    * Candidate scoring reuses [[bruteForceTopK]] (exact, bit-deterministic
    * fold → oracled); the vote is a tiny (|Q|·k)-row aggregate with a
    * deterministic tie-break (votes desc, label asc). Scale path: swap the
    * brute-force stage for [[ivfTopK]] — the vote is stage-agnostic.
    */
  val q67 = QuerySpec(
    "q67_knn_label",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val w = Window.partitionBy("qid").orderBy(col("votes").desc, col("label"))
      bruteForceTopK(e.filter(col("vec_id") < 10).limit(10),
        e.filter(col("vec_id") >= 10), k = 15)
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .groupBy("qid", "label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(w))
        .filter(col("vr") === 1)
        .select(col("qid"), col("label").as("pred_label"), col("votes"))
        .orderBy("qid")
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
            s AS (
              SELECT qid, vec_id, label,
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
              FROM q, (SELECT vec_id, embedding AS ee, label
                       FROM embeddings WHERE vec_id >= 10)),
            nn AS (
              SELECT qid, vec_id, label FROM (
                SELECT qid, vec_id, label,
                  ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY dot / NULLIF(SQRT(nq) * SQRT(nc), 0.0)
                      DESC NULLS LAST, vec_id) AS rn
                FROM s)
              WHERE rn <= 15),
            v AS (SELECT qid, label, COUNT(*) AS votes
                  FROM nn GROUP BY qid, label)
            SELECT qid, label AS pred_label, votes FROM (
              SELECT qid, label, votes,
                ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY votes DESC, label) AS vr
              FROM v)
            WHERE vr = 1 ORDER BY qid""")
  )

  // --------------------------------------------------------------- q121
  /** Per-DIMENSION embedding statistics — the whitening/normalization
    * profile (mean vector, per-dim energy, range) a training pipeline
    * computes before centering, PCA-whitening, or quantizing a vector
    * column. posexplode turns the (vec × dim) matrix into rows; the
    * aggregate is keyed by dim (64 groups — bounded by construction),
    * map-side combined, so at 100 TB the shuffle is #dims × #partitions
    * partial rows, never the matrix. Mean/energy go through decimal sums
    * ([[graft.operators.Ops.dsum]]'s idiom) so the oracle is bit-exact
    * under any partition order; min/max are exact by nature.
    */
  val q121 = QuerySpec(
    "q121_embedding_dim_stats",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "vf")))
        .select(col("dim").cast("long").as("dim"), col("vf").cast("double").as("v"))
        .groupBy("dim")
        .agg(
          count(lit(1)).as("n"),
          graft.operators.Ops.ffloor(
            sum(col("v").cast(graft.operators.Ops.Dec)).cast("double") /
              count(lit(1)), 4).as("mean"),
          graft.operators.Ops.ffloor(
            sum((col("v") * col("v")).cast(graft.operators.Ops.Dec))
              .cast("double") / count(lit(1)), 4).as("energy"),
          min("v").as("vmin"), max("v").as("vmax"))
        .orderBy("dim"),
    Some("""WITH x AS (
              SELECT unnest(range(len(embedding))) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings)
            SELECT dim, COUNT(*) AS n,
              CAST(FLOOR(CAST(SUM(CAST(v AS DECIMAL(30,10))) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS mean,
              CAST(FLOOR(CAST(SUM(CAST(v * v AS DECIMAL(30,10))) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS energy,
              MIN(v) AS vmin, MAX(v) AS vmax
            FROM x GROUP BY dim ORDER BY dim""")
  )

  // ---------------------------------------------------------------- q195
  /** Oracled EXACTNESS audit for the IVF machinery — [[q38]]'s
    * driver-checkable twin (the q168/q175 audit pattern): Spark runs the
    * IVF pipeline with nprobe = k (all 8 cells probed — which must
    * degenerate to exact search) AND the brute-force top-10
    * ([[bruteForceTopK]], q29's code path), and gates their per-query
    * SET EQUALITY. Unlike a statistical recall bound this is a UNIVERSAL
    * invariant, valid on any corpus including fuzz: full-probe IVF equals
    * brute force iff cell assignment PARTITIONS the corpus (no vector
    * dropped, none duplicated across cells) and the probed-cell scoring/
    * ranking path agrees with the exact scorer — precisely the machinery
    * a centroid regression, probe-routing bug, or broken assignment
    * corrupts. DuckDB independently recomputes the exact side's counts
    * (q29's ANSI cosine top-k) and pins `recall_ok` TRUE.
    *
    * Why not gate 3-probe recall: on this near-uniform synthetic corpus
    * 3-of-8-cell recall@10 is chance-level (measured min 0.3 / avg 0.6 at
    * sf0.001 — neighbors of a uniform vector spread across all cells), so
    * any passable bound would also pass a BROKEN router, which still
    * scoops up ~nprobe/k of true neighbors by volume. The pruning-quality
    * number for the fixtures is asserted in LlmOpsSpec instead;
    * clustered real embeddings are where 3-probe recall is meaningful.
    * Scale shape: two corpus scans (audit-only cost), broadcast query
    * trio, |Q|·k-row audit join — driver-side nothing.
    */
  val q195 = QuerySpec(
    "q195_ivf_recall_audit",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id").isin(100L, 101L, 102L)).limit(3)
      val exact = bruteForceTopK(queries, e, k = 10)
        .select(col("qid"), col("vec_id"))
      val centroids = kmeansCentroids(e, k = 8, iters = 3)
      val ivf = ivfQuery(centroids, ivfAssign(e, centroids), queries,
        nprobe = 8, topK = 10).select(col("qid"), col("vec_id"))
      val perQ = exact.join(ivf, Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
        .join(exact.groupBy("qid").agg(count(lit(1)).as("n_exact")), Seq("qid"), "right")
      perQ.agg(
        count(lit(1)).as("n_queries"),
        // coalesce: empty query set sums to NULL, but the oracle's
        // COUNT(*) is 0 — same class as q168's vacuous-case typing.
        coalesce(sum("n_exact"), lit(0L)).cast("long").as("n_exact_rows"),
        // coalesce INSIDE min: a zero-hit query is recall 0.0, not a NULL
        // for min to skip; the outer coalesce covers only the no-queries
        // vacuous case (q168's explicit-emptiness discipline).
        (coalesce(min(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_exact")), lit(1.0)) >= 1.0).as("recall_ok"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id IN (100, 101, 102)),
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
              FROM q, (SELECT vec_id, embedding AS ee FROM embeddings)
              WHERE vec_id <> qid),
            topk AS (
              SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY dot / NULLIF(SQRT(nq) * SQRT(nc), 0.0)
                      DESC NULLS LAST, vec_id) AS rn
                FROM s)
              WHERE rn <= 10)
            SELECT (SELECT COUNT(DISTINCT qid) FROM topk) AS n_queries,
                   (SELECT COUNT(*) FROM topk) AS n_exact_rows,
                   true AS recall_ok""")
  )

  // ---------------------------------------------------------------- q244
  /** Oracled EXACTNESS audit for the hyperplane-LSH machinery — [[q32]]'s
    * driver-checkable twin (the q195 full-probe pattern): with nBits = 0
    * every vector lands in the single empty-signature bucket, so
    * [[lshNearDupPairs]]' candidate join degenerates to ALL pairs and its
    * output MUST equal the exact all-pairs cosine range search (q141's
    * oracled arithmetic, unblocked). A UNIVERSAL invariant — valid on any
    * corpus including fuzz — exercising every part of q32 except the
    * hyperplane sign bits themselves: the signature pass, the bucket
    * equi-join, the v1<v2 canonicalization, the exact-cosine verify, and
    * the micro-floored threshold. DuckDB recomputes the full pair list
    * independently (the same strict left-fold arithmetic q29/q141
    * hash-match) and the driver compares row for row.
    *
    * Scale shape: one bucket = one join key is audit-only BY DESIGN —
    * exactly the quadratic q32's nBits>0 bucketing exists to prevent; the
    * audit runs on the embeddings fixture (2k vectors at sf0.1 → ≤2M
    * pairs through one codegen'd dot-product pass), never a lake table.
    */
  val q244 = QuerySpec(
    "q244_lsh_exactness_audit",
    (s, d) => lshNearDupPairs(Tables.embeddings(s, d), minCos = 0.2, nBits = 0,
      auditOnly = true),
    Some("""WITH e AS (
              SELECT vec_id, embedding,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (x, y) -> x + y)) AS nrm
              FROM embeddings),
            p AS (
              SELECT a.vec_id AS v1, b.vec_id AS v2,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                  (x, y) -> x + y) AS dot,
                a.nrm AS n1, b.nrm AS n2
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
            SELECT v1, v2,
              CAST(FLOOR(dot / NULLIF(n1 * n2, 0.0) * 10000.0) AS DOUBLE) / 10000.0 AS cos
            FROM p
            WHERE CAST(FLOOR(dot / NULLIF(n1 * n2, 0.0) * 10000.0) AS DOUBLE) / 10000.0 >= 0.2
            ORDER BY v1, v2""")
  )

  val all: Seq[QuerySpec] =
    Seq(q29, q32, q38, q67, q82, q121, q195, q244)
}
