package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import graft.operators.Ops.ffloor
import Similarity._

/** Clustering / embedding-geometry side of the similarity stack,
  * extracted UNCHANGED from `Similarity.scala` (round-10 verdict
  * item 4: pure-move split so per-file audit tallies stay meaningful;
  * no logic edits): k-means assignment, k-center coreset, centroid
  * drift, random projection, power iteration, anisotropy audit,
  * DBSCAN, and the cluster-quality metrics (silhouette, ARI/purity,
  * NMI, k-dist profile). ANN search and its exactness/recall audits
  * stay in [[Similarity]].
  */
object Clustering {
  // --------------------------------------------------------------- q173
  /** Deterministic k-means E-STEP (Lloyd assignment) — the transparent
    * core of IVF index training (q38 consumes exactly this step's
    * output): every vector goes to its nearest of k=4 centroids by
    * squared L2, computed as ‖v‖² + ‖c‖² − 2⟨v,c⟩ from the same strict-
    * fold dot product q29 oracles. Centroid SEEDS are the four lowest
    * vec_ids — deterministic by construction (production uses k-means‖;
    * the E-step is the part that touches the corpus and must scale: a
    * per-row map over BROADCAST centroids, no shuffle until the k-row
    * rollup). Distances are micro-floored to exact longs BEFORE argmin
    * (ties break to the lowest centroid id via lexicographic min-struct)
    * and inertia is an exact long sum of those micro-units — no double
    * accumulation anywhere, so the assignment and the objective are
    * hash-stable cross-engine.
    */
  val q173 = QuerySpec(
    "q173_kmeans_assign",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nv"))
      val cents = e.filter(col("vec_id") < 4).limit(4)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nv").as("nc"))
      val dist2 = col("nv") + col("nc") -
        lit(2.0) * dot(col("embedding"), col("ce"))
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          col("cid"), floor(dist2 * lit(1000000.0)).cast("long").as("dmicro"))
        .groupBy("vec_id")
        .agg(min(struct(col("dmicro"), col("cid"))).as("__best"))
        .select(col("vec_id"), col("__best.cid").as("cid"),
          col("__best.dmicro").as("dmicro"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n_assigned"),
          sum(col("dmicro")).cast("long").as("inertia_micro"))
        .orderBy("cid")
    },
    Some("""WITH e AS (
              SELECT vec_id, embedding,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (x, y) -> x + y) AS nv
              FROM embeddings),
            c AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc
                  FROM e WHERE vec_id < 4),
            pairs AS (
              SELECT vec_id, cid,
                CAST(FLOOR((nv + nc
                  - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(range(1, len(embedding) + 1),
                        i -> CAST(embedding[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))),
                      (x, y) -> x + y)) * 1000000.0) AS BIGINT) AS dmicro
              FROM e, c),
            best AS (
              SELECT vec_id, cid, dmicro FROM pairs
              QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dmicro, cid) = 1)
            SELECT cid, COUNT(*) AS n_assigned,
              CAST(SUM(dmicro) AS BIGINT) AS inertia_micro
            FROM best GROUP BY cid ORDER BY cid""")
  )

  /** DuckDB strict-left-fold dot product (the q29 oracle idiom), shared by
    * the embedding oracles below. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       list_transform(range(1, len($a) + 1),
       i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"""

  /** Micro-floored squared L2 between an `e`-row aliased `v` and a center
    * row aliased `c` — q173's exact-integer distance, as oracle SQL. */
  private val dmSql: String =
    s"""CAST(FLOOR((v.nv + c.nc - 2.0 * ${dotSql("v.embedding", "c.ce")})
       * 1000000.0) AS BIGINT)"""

  // --------------------------------------------------------------- q178
  /** Greedy k-CENTER (farthest-point) CORESET selection — the diverse-
    * subset primitive behind coreset data selection for training: pick
    * the vector farthest from every center chosen so far, k times. The
    * greedy is a 2-approximation of the optimal k-center cover (Gonzalez
    * 1985), and its selection trace is fully deterministic here because
    * every comparison happens on micro-floored integer distances
    * (q173's contract) with vec_id tie-breaks.
    *
    * Scale shape — the part that matters at 10⁹ vectors: each of the k
    * rounds is ONE narrow corpus pass (broadcast of the single new
    * center, per-row `least` against the carried min-distance) followed
    * by a 1-row TakeOrdered argmax; nothing ever shuffles the corpus,
    * and driver state is k ids (the q118 boundary-collect budget). The
    * final reported assignment reuses q173's broadcast E-step over the
    * selected k centers.
    */
  val q178 = QuerySpec(
    "q178_kcenter_coreset",
    (s, d) => {
      val k = 4
      val e = graft.core.Materialize(Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          dot(col("embedding"), col("embedding")).as("nv")))
      def dmicroTo(cid: Long): DataFrame = {
        // limit(1): cardinality witness — vec_id is unique, so the filter
        // selects exactly one row; the witness survives e's Materialize
        // (an RDD scan PlanGate distrusts) and proves the broadcast side.
        val c = e.filter(col("vec_id") === cid).limit(1)
          .select(col("embedding").as("ce"), col("nv").as("nc"))
        e.crossJoin(broadcast(c))
          .select(col("vec_id"),
            floor((col("nv") + col("nc") -
              lit(2.0) * dot(col("embedding"), col("ce"))) * lit(1000000.0))
              .cast("long").as("dm"))
      }
      val first = e.agg(min(col("vec_id"))).head.getLong(0)
      var centers = Seq(first)
      var mind = dmicroTo(first)
      while (centers.size < k) {
        // argmax of the carried min-distance; ties to the lowest vec_id
        val next = mind.orderBy(col("dm").desc, col("vec_id")).limit(1)
          .head.getLong(0)
        centers = centers :+ next
        mind = mind.as("m").join(dmicroTo(next).select(
            col("vec_id"), col("dm").as("dn")), "vec_id")
          .select(col("vec_id"), least(col("dm"), col("dn")).as("dm"))
      }
      import s.implicits._
      val rounds = centers.zipWithIndex
        .map { case (cid, i) => (i + 1, cid) }.toDF("sel_round", "cid")
      // limit(k): witness — isin(centers) selects ≤ k distinct unique ids
      // and the rounds join is 1:1 on cid, so the center set is ≤ k rows.
      val cents = e.filter(col("vec_id").isin(centers: _*))
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nv").as("nc"))
        .join(rounds, "cid")
        .limit(k)
      val dist2 = col("nv") + col("nc") -
        lit(2.0) * dot(col("embedding"), col("ce"))
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("sel_round"), col("cid"),
          floor(dist2 * lit(1000000.0)).cast("long").as("dm"))
        .groupBy("vec_id")
        .agg(min(struct(col("dm"), col("cid"), col("sel_round"))).as("__best"))
        .select(col("__best.sel_round").as("sel_round"),
          col("__best.cid").as("cid"), col("__best.dm").as("dm"))
        .groupBy("sel_round", "cid")
        .agg(count(lit(1)).as("n_assigned"),
          max(col("dm")).cast("long").as("radius_micro"))
        .orderBy("sel_round")
    },
    Some(s"""WITH e AS (
              SELECT vec_id, embedding,
                ${dotSql("embedding", "embedding")} AS nv
              FROM embeddings),
            c1 AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc FROM e
                   WHERE vec_id = (SELECT MIN(vec_id) FROM e)),
            m1 AS (SELECT v.vec_id, $dmSql AS dm FROM e v, c1 c),
            c2 AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc FROM e
                   WHERE vec_id = (SELECT vec_id FROM m1
                                   ORDER BY dm DESC, vec_id LIMIT 1)),
            m2 AS (SELECT m1.vec_id, LEAST(m1.dm, n.dm) AS dm FROM m1 JOIN
                   (SELECT v.vec_id, $dmSql AS dm FROM e v, c2 c) n
                   ON m1.vec_id = n.vec_id),
            c3 AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc FROM e
                   WHERE vec_id = (SELECT vec_id FROM m2
                                   ORDER BY dm DESC, vec_id LIMIT 1)),
            m3 AS (SELECT m2.vec_id, LEAST(m2.dm, n.dm) AS dm FROM m2 JOIN
                   (SELECT v.vec_id, $dmSql AS dm FROM e v, c3 c) n
                   ON m2.vec_id = n.vec_id),
            c4 AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc FROM e
                   WHERE vec_id = (SELECT vec_id FROM m3
                                   ORDER BY dm DESC, vec_id LIMIT 1)),
            centers AS (
              SELECT 1 AS sel_round, cid, ce, nc FROM c1 UNION ALL
              SELECT 2, cid, ce, nc FROM c2 UNION ALL
              SELECT 3, cid, ce, nc FROM c3 UNION ALL
              SELECT 4, cid, ce, nc FROM c4),
            ad AS (SELECT v.vec_id, c.sel_round, c.cid, $dmSql AS dm
                   FROM e v, centers c),
            best AS (SELECT vec_id, sel_round, cid, dm FROM ad
                     QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY dm, cid) = 1)
            SELECT sel_round, cid, CAST(COUNT(*) AS BIGINT) AS n_assigned,
              CAST(MAX(dm) AS BIGINT) AS radius_micro
            FROM best GROUP BY 1, 2 ORDER BY sel_round""")
  )

  // --------------------------------------------------------------- q185
  /** CENTROID-DRIFT matrix between label groups — "how separated are my
    * embedding clusters / how far has a source's embedding distribution
    * moved": pairwise cosine between per-label MEAN vectors. The exact-
    * arithmetic trick that makes a mean-vector cosine hash-comparable:
    * cosine is scale-invariant, so the mean never needs computing —
    * cos(mean_a, mean_b) = cos(sum_a, sum_b), and the SUM vectors are
    * exact integers once components are micro-floored (the q173
    * contract). Dot/norms over the sum vectors are then exact
    * DECIMAL(38,0)/HUGEINT products of longs — order-independent, so the
    * one corpus-wide aggregate commutes freely — with a single
    * double conversion + ffloor at the very end.
    *
    * Scale shape: ONE posexplode pass over the corpus → (label, dim)
    * keyed aggregate (|labels|·dim groups, map-side combinable); the
    * pairwise join runs on the |labels|·dim summary — corpus-independent.
    */
  val q185 = QuerySpec(
    "q185_centroid_drift",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      // materialized: the |labels|·dim summary feeds BOTH self-join sides —
      // without it the corpus pass (posexplode + aggregate) runs twice
      val comps = graft.core.Materialize(Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(sum(floor(col("x").cast("double") * lit(1000000.0)).cast("long"))
          .as("sv"), count(lit(1)).as("n")))
      val a = comps.select(col("label").as("l1"), col("dim"),
        col("sv").as("sa"), col("n").as("n1"))
      val b = comps.select(col("label").as("l2"), col("dim"),
        col("sv").as("sb"), col("n").as("n2"))
      val dec = DecimalType(38, 0)
      a.join(b, Seq("dim")).filter(col("l1") < col("l2"))
        .groupBy("l1", "l2")
        .agg(
          sum(col("sa").cast(dec) * col("sb").cast(dec)).as("dot"),
          sum(col("sa").cast(dec) * col("sa").cast(dec)).as("na"),
          sum(col("sb").cast(dec) * col("sb").cast(dec)).as("nb"))
        .select(col("l1"), col("l2"),
          graft.operators.Ops.ffloor(col("dot").cast("double") /
            nullif(sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")),
              lit(0.0)), 6).as("centroid_cos"))
        .orderBy("l1", "l2")
    },
    Some("""WITH comps AS (
              SELECT label, i - 1 AS dim,
                CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT)) AS BIGINT) AS sv
              FROM (SELECT label, embedding,
                      unnest(range(1, len(embedding) + 1)) AS i
                    FROM embeddings)
              GROUP BY label, i),
            pairs AS (
              SELECT a.label AS l1, b.label AS l2,
                SUM(CAST(a.sv AS HUGEINT) * b.sv) AS dot,
                SUM(CAST(a.sv AS HUGEINT) * a.sv) AS na,
                SUM(CAST(b.sv AS HUGEINT) * b.sv) AS nb
              FROM comps a JOIN comps b ON a.dim = b.dim AND a.label < b.label
              GROUP BY 1, 2)
            SELECT l1, l2,
              CAST(FLOOR(CAST(dot AS DOUBLE) /
                NULLIF(SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)), 0.0)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS centroid_cos
            FROM pairs ORDER BY l1, l2""")
  )

  // --------------------------------------------------------------- q189
  /** Johnson–Lindenstrauss RANDOM-SIGN PROJECTION: compress every
    * embedding to k = 8 coordinates, each the signed sum Σᵢ xᵢ·s(i,j)
    * with s ∈ {+1,−1} — the dimensionality-reduction step a billion-
    * vector pipeline runs BEFORE banding/bucketing (8 coordinates make
    * LSH bands and coarse filters dramatically cheaper, and the JL lemma
    * bounds the pairwise-distance distortion). The sign matrix is
    * HASH-derived (md5 parity of "i_j"), not sampled: increments,
    * re-runs, and the DuckDB oracle all regenerate the identical matrix,
    * which is what makes a sketch joinable across ingest epochs.
    *
    * Scale shape: one posexplode pass over the corpus joined to the
    * BROADCAST dim×k sign table (512 rows — built from one bounded 1-row
    * dimensionality lookup), then a (vec_id, j) keyed aggregate with
    * map-side partials. Components are micro-floored longs (q173's
    * contract), signs are ±1 longs, so the projection is EXACT integer
    * arithmetic end-to-end — hash-comparable with no epsilon.
    */
  val q189 = QuerySpec(
    "q189_random_projection",
    (s, d) => {
      val k = 8
      val e = Tables.embeddings(s, d)
      // bounded driver lookup: the corpus' (constant) dimensionality
      val dim = e.select(size(col("embedding"))).head.getInt(0)
      import s.implicits._
      val signs = (0 until dim).flatMap(i => (0 until k).map(j => (i, j)))
        .toDF("i", "j")
        .select(col("i"), col("j"),
          (lit(1L) - lit(2L) *
            (conv(substring(md5(concat_ws("_", col("i"), col("j"))), 1, 1),
              16, 10).cast("long") % 2)).as("sg"))
      e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("i"),
          floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("xm"))
        .join(broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(sum(col("xm") * col("sg")).as("proj_micro"))
        .select(col("vec_id"), col("j").cast("long").as("out_dim"),
          col("proj_micro"))
        .orderBy("vec_id", "out_dim")
    },
    Some("""WITH comps AS (
              SELECT vec_id, unnest(range(len(embedding))) AS i,
                CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xm
              FROM embeddings),
            dims AS (SELECT DISTINCT i FROM comps),
            ks AS (SELECT unnest(range(8)) AS j),
            signs AS (
              SELECT i, j,
                1 - 2 * ((strpos('0123456789abcdef',
                  substr(md5(CAST(i AS VARCHAR) || '_' ||
                    CAST(j AS VARCHAR)), 1, 1)) - 1) % 2) AS sg
              FROM dims, ks)
            SELECT c.vec_id, CAST(s.j AS BIGINT) AS out_dim,
              CAST(SUM(c.xm * s.sg) AS BIGINT) AS proj_micro
            FROM comps c JOIN signs s ON c.i = s.i
            GROUP BY 1, 2 ORDER BY vec_id, out_dim""")
  )

  // --------------------------------------------------------------- q192
  /** POWER ITERATION for the dominant eigenvector of the corpus Gram
    * matrix XᵀX — the "principal direction" primitive behind embedding
    * whitening, drift monitoring, and spectral diagnostics, computed
    * WITHOUT MLlib and without a d×d covariance materialization: each
    * iteration is y = Xv (corpus pass, keyed by vec_id) then z = Xᵀy
    * (corpus pass, keyed by dim) — the d-dimensional state never exceeds
    * |dims| rows and v is always the BROADCAST side.
    *
    * The novelty that makes it hash-oracle-able: the whole iteration is
    * EXACT integer arithmetic. Components are micro-floored longs, y
    * stays in long (|y| ≤ d·10¹²), z is summed in DECIMAL(38,0)/HUGEINT,
    * and renormalization uses the MAX-norm with sign·(|z|·10⁶ div
    * max|z|) — abs() makes floor-division and truncation agree, so both
    * engines round identically with NO floating point anywhere. Max-norm
    * rescaling preserves direction exactly like L2 would, and the
    * per-iteration trace (v₁, v₂) is emitted so convergence is visible.
    */
  /** (vec_id, j, xm): micro-floored exploded components — the shared
    * input of the exact power-iteration family (q192/q194).
    */
  private def powerComps(e: DataFrame): DataFrame =
    graft.core.Materialize(e
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("vec_id"), col("j"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("xm")))

  /** One exact power-iteration step (see [[q192]] for the arithmetic
    * contract): y = Xv (long), z = Xᵀy (DECIMAL 38,0), max-norm integer
    * renormalization. Returns the d-row (j, vm) vector, Materialized with
    * a `.limit(dim)` CARDINALITY WITNESS (semantic no-op — j ranges over
    * the dim indices, ≤ dim rows by the groupBy("j") key): the witness
    * survives the checkpoint's opaque RDD scan and proves the next
    * iteration's `broadcast(v)` side for the plan gate.
    */
  private def powerIterate(comps: DataFrame, v: DataFrame, dim: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val y = comps.join(broadcast(v), "j")
      .groupBy("vec_id").agg(sum(col("xm") * col("vm")).as("y"))
    val z = comps.join(y, "vec_id")
      .groupBy("j")
      .agg(sum(col("xm").cast(dec) * col("y").cast(dec)).as("z"))
    val m = z.agg(max(abs(col("z"))).as("m"))
    graft.core.Materialize(z.crossJoin(m).select(col("j"),
      (when(col("z") < 0, lit(-1L)).otherwise(lit(1L)) *
        expr("(abs(z) * CAST(1000000 AS DECIMAL(38,0))) div " +
          "nullif(m, CAST(0 AS DECIMAL(38,0)))")).as("vm"))).limit(dim)
  }

  /** Dominant-direction vector after two exact iterations from v₀ = 1. */
  private def powerV2(comps: DataFrame, dim: Int): DataFrame = {
    val v0 = comps.select("j").distinct()
      .select(col("j"), lit(1000000L).as("vm"))
    powerIterate(comps, powerIterate(comps, v0, dim), dim)
  }

  /** The oracle-side spelling of [[powerComps]]+[[powerV2]]: CTEs ending
    * in v2(j, vm). Shared by q192/q194.
    */
  private val powerCtes: String =
    """comps AS (
              SELECT vec_id, unnest(range(len(embedding))) AS j,
                CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xm
              FROM embeddings),
            v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS vm
                   FROM comps),
            y1 AS (SELECT c.vec_id, CAST(SUM(c.xm * v.vm) AS BIGINT) AS y
                   FROM comps c JOIN v0 v USING (j) GROUP BY 1),
            z1 AS (SELECT c.j, SUM(CAST(c.xm AS HUGEINT) * y.y) AS z
                   FROM comps c JOIN y1 y USING (vec_id) GROUP BY 1),
            m1 AS (SELECT MAX(ABS(z)) AS m FROM z1),
            v1 AS (SELECT j,
                     CAST((CASE WHEN z < 0 THEN -1 ELSE 1 END) *
                       ((ABS(z) * 1000000) // NULLIF(m, 0)) AS BIGINT) AS vm
                   FROM z1, m1),
            y2 AS (SELECT c.vec_id, CAST(SUM(c.xm * v.vm) AS BIGINT) AS y
                   FROM comps c JOIN v1 v USING (j) GROUP BY 1),
            z2 AS (SELECT c.j, SUM(CAST(c.xm AS HUGEINT) * y.y) AS z
                   FROM comps c JOIN y2 y USING (vec_id) GROUP BY 1),
            m2 AS (SELECT MAX(ABS(z)) AS m FROM z2),
            v2 AS (SELECT j,
                     CAST((CASE WHEN z < 0 THEN -1 ELSE 1 END) *
                       ((ABS(z) * 1000000) // NULLIF(m, 0)) AS BIGINT) AS vm
                   FROM z2, m2)"""

  val q192 = QuerySpec(
    "q192_power_iteration",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val dim = e.select(size(col("embedding"))).head.getInt(0)
      val comps = powerComps(e)
      val v0 = comps.select("j").distinct()
        .select(col("j"), lit(1000000L).as("vm"))
      val v1 = powerIterate(comps, v0, dim)
      val v2 = powerIterate(comps, v1, dim)
      v1.select(lit(1L).as("iter"), col("j").cast("long").as("dim"), col("vm"))
        .unionByName(v2.select(lit(2L).as("iter"),
          col("j").cast("long").as("dim"), col("vm")))
        .orderBy("iter", "dim")
    },
    Some(s"""WITH $powerCtes
            SELECT CAST(1 AS BIGINT) AS iter, CAST(j AS BIGINT) AS dim, vm
            FROM v1
            UNION ALL
            SELECT 2, CAST(j AS BIGINT), vm FROM v2
            ORDER BY iter, dim""")
  )

  // --------------------------------------------------------------- q194
  /** ANISOTROPY AUDIT: per label, the fraction of total embedding energy
    * explained by the corpus' dominant direction (q192's v₂) — the
    * "is one direction eating my embedding space" diagnostic behind
    * whitening decisions: anisotropic embedding batches (ratio → 1)
    * make cosine similarity degenerate, and a label whose ratio departs
    * from the corpus norm signals a drifted or collapsed encoder.
    *
    * Exactness: with integer v, x·v and ‖v‖² are exact longs and the
    * label rollup sums (x·v)² and ‖x‖² in DECIMAL(38,0)/HUGEINT, so
    * ratio = Σ(x·v)² / (‖v‖²·Σ‖x‖²) is a single double division of two
    * exact integers (both engines round the int→double conversion
    * identically), then ffloor'd. The corpus cost on top of q192's two
    * iterations is ONE more pass (the per-vector dot + energy).
    */
  val q194 = QuerySpec(
    "q194_anisotropy_audit",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val e = Tables.embeddings(s, d)
      val dim = e.select(size(col("embedding"))).head.getInt(0)
      val comps = powerComps(e)
      val v2 = powerV2(comps, dim)
      val vv = v2.agg(sum(col("vm") * col("vm")).as("vv"))
      val per = comps.join(broadcast(v2), "j")
        .groupBy("vec_id")
        .agg(sum(col("xm") * col("vm")).as("xv"),
          sum(col("xm") * col("xm")).as("xx"))
      per.join(e.select(col("vec_id"), col("label")), "vec_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("xv").cast(dec) * col("xv").cast(dec)).as("exp2"),
          sum(col("xx").cast(dec)).as("tot"))
        .crossJoin(vv)
        .select(col("label"), col("n_vecs"),
          graft.operators.Ops.ffloor(col("exp2").cast("double") /
            (col("vv").cast("double") * col("tot").cast("double")), 6)
            .as("explained_ratio"))
        .orderBy("label")
    },
    Some(s"""WITH $powerCtes,
            vv AS (SELECT CAST(SUM(vm * vm) AS BIGINT) AS vv FROM v2),
            per AS (SELECT c.vec_id,
                      CAST(SUM(c.xm * v.vm) AS BIGINT) AS xv,
                      CAST(SUM(c.xm * c.xm) AS BIGINT) AS xx
                    FROM comps c JOIN v2 v USING (j) GROUP BY 1),
            lab AS (SELECT p.vec_id, p.xv, p.xx, e.label
                    FROM per p JOIN embeddings e USING (vec_id))
            SELECT label, COUNT(*) AS n_vecs,
              CAST(FLOOR(
                CAST(SUM(CAST(xv AS HUGEINT) * xv) AS DOUBLE) /
                (CAST(vv AS DOUBLE) * CAST(SUM(CAST(xx AS HUGEINT)) AS DOUBLE))
                * 1000000.0) AS DOUBLE) / 1000000.0 AS explained_ratio
            FROM lab, vv
            GROUP BY label, vv ORDER BY label""")
  )

  // --------------------------------------------------------------- q236
  /** DBSCAN over the embedding lake — density-based clustering composed
    * ENTIRELY from audited primitives: ε-neighbor edges are [[q141]]'s
    * blocked exact cosine range pairs (cos ≥ 0.4; the unblocked 100 TB
    * candidate path is q32's hyperplane-LSH bucketing, same contract as
    * q141 documents), core points have ≥ minPts−1 = 2 neighbors,
    * clusters are [[graft.llmops.DedupGraph.connectedComponents]]' min-label
    * fixpoint over the CORE-core subgraph (the standard disjoint-set
    * formulation of DBSCAN's density-reachability), border points attach
    * to their lowest-labelled core neighbor, everything else is noise
    * (cluster −1). Every decision happens on micro-floored integer
    * cosines with id tie-breaks, so the full per-point labelling —
    * role AND cluster — is hash-stable and the oracle replays it with a
    * recursive CTE.
    *
    * Scale shape: the only corpus-quadratic risk is the pair join, and
    * it is block-bounded (q141); the fixpoint runs on the core edge
    * list; degree/border/noise are keyed aggregates and left joins on
    * the vector table. An isolated core (no core neighbor) is its own
    * singleton cluster — coalesce(cluster, id), no extra pass.
    */
  val q236 = QuerySpec(
    "q236_dbscan",
    (s, d) => {
      val tau = 0.4
      val e = Tables.embeddings(s, d).select(
        col("label"), col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      val a = e.select(col("label"), col("vec_id").as("id1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
      val b = e.select(col("label"), col("vec_id").as("id2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
      val cos = graft.operators.Ops.ffloor(cosineFromParts(
        dot(col("e1"), col("e2")), col("n1"), col("n2")), 6)
      val half = a.join(b, Seq("label")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"), cos.as("cos"))
        .filter(col("cos") >= tau)
        .select(col("id1").as("src"), col("id2").as("dst"))
      val edges = graft.core.Materialize(
        half.union(half.select(col("dst").as("src"), col("src").as("dst"))))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val coreIds = graft.core.Materialize(
        deg.filter(col("deg") >= 2).select(col("src").as("id")))
      val coreEdges = edges
        .join(coreIds.select(col("id").as("src")), "src")
        .join(coreIds.select(col("id").as("dst")), "dst")
        .select("src", "dst")
      val cc = DedupGraph.connectedComponents(coreEdges)
        .select(col("doc_id").as("id"), col("cluster"))
      val coreLab = graft.core.Materialize(coreIds
        .join(cc, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster")))
      val borderLab = edges
        .join(coreIds.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(coreLab.select(col("id").as("dst"), col("cluster")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("cluster").as("cluster"))
      e.select(col("vec_id"))
        .join(coreLab.select(col("id").as("vec_id"),
          col("cluster").as("core_cl")), Seq("vec_id"), "left")
        .join(borderLab.select(col("id").as("vec_id"),
          col("cluster").as("border_cl")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("core_cl").isNotNull, "core")
            .when(col("border_cl").isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce(col("core_cl"), col("border_cl"), lit(-1L)).as("cluster"))
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE e AS (
              SELECT label, vec_id, embedding,
                sqrt(${dotSql("embedding", "embedding")}) AS nrm
              FROM embeddings),
            half AS (
              SELECT a.vec_id AS src, b.vec_id AS dst
              FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE CAST(FLOOR(${dotSql("a.embedding", "b.embedding")}
                / NULLIF(a.nrm * b.nrm, 0.0) * 1000000.0) AS DOUBLE)
                / 1000000.0 >= 0.4),
            edges AS (
              SELECT src, dst FROM half
              UNION ALL SELECT dst, src FROM half),
            deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
            core AS (SELECT src AS id FROM deg WHERE deg >= 2),
            ce AS (
              SELECT e2.src, e2.dst FROM edges e2
              JOIN core c1 ON e2.src = c1.id
              JOIN core c2 ON e2.dst = c2.id),
            reach(id, lbl) AS (
              SELECT src AS id, src AS lbl FROM ce
              UNION
              SELECT e3.dst AS id, r.lbl AS lbl
              FROM ce e3 JOIN reach r ON r.id = e3.src),
            cc AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
            core_lab AS (
              SELECT c.id, COALESCE(cc.cluster, c.id) AS cluster
              FROM core c LEFT JOIN cc ON cc.id = c.id),
            border_lab AS (
              SELECT e4.src AS id, MIN(cl.cluster) AS cluster
              FROM edges e4
              JOIN core_lab cl ON e4.dst = cl.id
              WHERE e4.src NOT IN (SELECT id FROM core)
              GROUP BY 1)
            SELECT v.vec_id,
              CASE WHEN k.cluster IS NOT NULL THEN 'core'
                   WHEN b.cluster IS NOT NULL THEN 'border'
                   ELSE 'noise' END AS role,
              COALESCE(k.cluster, b.cluster, -1) AS cluster
            FROM e v
            LEFT JOIN core_lab k ON k.id = v.vec_id
            LEFT JOIN border_lab b ON b.id = v.vec_id
            ORDER BY v.vec_id""")
  )

  // --------------------------------------------------------------- q237
  /** Simplified (centroid-based) SILHOUETTE — the clustering-quality
    * audit for [[q173]]'s assignment: s = (b − a)/max(a, b) with a = the
    * micro-floored squared distance to the OWN centroid and b = to the
    * nearest OTHER centroid. The full silhouette's pairwise means are
    * corpus-quadratic; the centroid form is the standard linear-time
    * surrogate (and exact for it: a and b are q173's exact integer
    * micro-distances, s pays one double division per row, floored to
    * micros, then per-cluster means are exact-long sums with one final
    * division).
    *
    * Scale shape: the same broadcast E-step scan as q173 (corpus × k
    * rows through a per-vec_id window of width k), then a k-row rollup.
    */
  val q237 = QuerySpec(
    "q237_silhouette",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nv"))
      val cents = e.filter(col("vec_id") < 4).limit(4)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nv").as("nc"))
      val dist2 = col("nv") + col("nc") -
        lit(2.0) * dot(col("embedding"), col("ce"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy("dmicro", "cid")
      val ranked = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          floor(dist2 * lit(1000000.0)).cast("long").as("dmicro"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      val aSide = ranked.filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("dmicro").as("a"))
      val bSide = ranked.filter(col("rn") === 2)
        .select(col("vec_id"), col("dmicro").as("b"))
      aSide.join(bSide, "vec_id")
        .withColumn("s_micro",
          when(greatest(col("a"), col("b")) === 0, lit(0L))
            .otherwise(floor((col("b") - col("a")).cast("double") /
              greatest(col("a"), col("b")).cast("double") * lit(1e6))
              .cast("long")))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"),
          graft.operators.Ops.ffloor(sum("s_micro").cast("double") /
            (count(lit(1)).cast("double") * lit(1e6)), 6)
            .as("mean_silhouette"))
        .orderBy("cid")
    },
    Some(s"""WITH e AS (
              SELECT vec_id, embedding,
                ${dotSql("embedding", "embedding")} AS nv
              FROM embeddings),
            c AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc
                  FROM e WHERE vec_id < 4),
            pairs AS (
              SELECT vec_id, cid,
                CAST(FLOOR((nv + nc - 2.0 * ${dotSql("embedding", "ce")})
                  * 1000000.0) AS BIGINT) AS dmicro
              FROM e, c),
            ranked AS (
              SELECT vec_id, cid, dmicro,
                ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY dmicro, cid) AS rn
              FROM pairs),
            ab AS (
              SELECT a.vec_id, a.cid, a.dmicro AS a, b.dmicro AS b
              FROM ranked a JOIN ranked b
                ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
            sc AS (
              SELECT cid,
                CASE WHEN GREATEST(a, b) = 0 THEN 0
                  ELSE CAST(FLOOR(CAST(b - a AS DOUBLE)
                    / CAST(GREATEST(a, b) AS DOUBLE) * 1000000.0) AS BIGINT)
                END AS s_micro
              FROM ab)
            SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(FLOOR(CAST(SUM(s_micro) AS DOUBLE)
                / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS mean_silhouette
            FROM sc GROUP BY cid ORDER BY cid""")
  )

  /** The q173 E-step assignment (vec_id, cid) joined with the vector's
    * ground-truth label — the contingency grain [[q238]]/[[q239]] audit.
    */
  private def kmeansVsLabel(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding"), dot(col("embedding"), col("embedding")).as("nv"))
    val cents = e.filter(col("vec_id") < 4).limit(4)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("nv").as("nc"))
    val dist2 = col("nv") + col("nc") -
      lit(2.0) * dot(col("embedding"), col("ce"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("cid"),
        floor(dist2 * lit(1000000.0)).cast("long").as("dmicro"))
      .groupBy("vec_id")
      .agg(min(struct(col("dmicro"), col("cid"))).as("__best"),
        first(col("label")).as("label"))
      .select(col("vec_id"), col("__best.cid").as("cid"), col("label"))
  }

  /** Shared oracle CTE: (cid, label, nij) contingency of the q173
    * assignment against the ground-truth label. */
  private val contingencySql: String = s"""e AS (
              SELECT vec_id, label, embedding,
                ${dotSql("embedding", "embedding")} AS nv
              FROM embeddings),
            c AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc
                  FROM e WHERE vec_id < 4),
            dists AS (
              SELECT vec_id, label, cid,
                CAST(FLOOR((nv + nc - 2.0 * ${dotSql("embedding", "ce")})
                  * 1000000.0) AS BIGINT) AS dmicro
              FROM e, c),
            best AS (
              SELECT vec_id, label, cid FROM dists
              QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dmicro, cid) = 1),
            ct AS (SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS nij
                   FROM best GROUP BY 1, 2)"""

  // --------------------------------------------------------------- q238
  /** ADJUSTED RAND INDEX + purity — does [[q173]]'s geometric clustering
    * recover the ground-truth labels? ARI is the chance-corrected
    * pair-counting agreement; purity the simpler majority-label mass.
    * Every term is pair combinatorics — C(x,2), computed exactly in
    * DECIMAL(38,0) by halving the even factor in int64 first (see c2) —
    * and the chance correction is cleared of fractions by multiplying
    * through by 2·C(n,2):
    *
    *   ARI = (2·T·Σij − 2·ΣA·ΣB) / (T·(ΣA+ΣB) − 2·ΣA·ΣB),  T = C(n,2)
    *
    * so numerator and denominator are exact DECIMAL(38,0)/HUGEINT and
    * ONE double division closes (a degenerate denominator — all points
    * in one cluster and one label — pins ARI to 1 by convention).
    *
    * Scale shape: the broadcast E-step scan, then everything lives on
    * the k×L contingency table.
    */
  val q238 = QuerySpec(
    "q238_ari_purity",
    (s, d) => {
      val ct = graft.core.Materialize(kmeansVsLabel(s, d)
        .groupBy("cid", "label").agg(count(lit(1)).as("nij")))
      // C(x,2) margins in exact DECIMAL(38,0) (the q217 cast-before-
      // multiply discipline): int64 x·(x−1) wraps past x ≈ 3e9, and
      // `div` on DECIMAL operands returns LONG in Spark (wrapping again
      // past ~4.3e9), so the halving is done FIRST on the even factor in
      // int64 (exact, no overflow) and the one multiply runs in decimal —
      // the product of two int64-range factors is < 1e38, always
      // representable. DuckDB's twin computes the same value in HUGEINT.
      def c2(x: String): String =
        s"CAST(CASE WHEN $x % 2 = 0 THEN $x div 2 ELSE $x END AS DECIMAL(38,0))" +
          s" * (CASE WHEN $x % 2 = 0 THEN $x - 1 ELSE ($x - 1) div 2 END)"
      val aM = ct.groupBy("cid").agg(sum("nij").cast("long").as("ai"))
        .agg(sum(expr(c2("ai"))).cast(DecimalType(38, 0)).as("sa"),
          count(lit(1)).as("k_clusters"))
      val bM = ct.groupBy("label").agg(sum("nij").cast("long").as("bj"))
        .agg(sum(expr(c2("bj"))).cast(DecimalType(38, 0)).as("sb"),
          count(lit(1)).as("n_labels"))
      val cells = ct.agg(
        sum(expr(c2("nij"))).cast(DecimalType(38, 0)).as("sij"),
        sum("nij").cast("long").as("n"))
      val pur = ct.groupBy("cid").agg(max("nij").as("mx"))
        .agg(sum("mx").cast("long").as("pure"))
      cells.crossJoin(broadcast(aM)).crossJoin(broadcast(bM))
        .crossJoin(broadcast(pur))
        .withColumn("t", expr(c2("n")).cast(DecimalType(38, 0)))
        .select(col("n"), col("k_clusters"), col("n_labels"),
          expr("(pure * 1000000) div n").as("purity_micro"),
          when(col("t") * (col("sa") + col("sb")) - col("sa") * col("sb") * 2 === 0,
            lit(1.0))
            .otherwise(ffloor(
              (col("t") * col("sij") * 2 - col("sa") * col("sb") * 2).cast("double") /
                (col("t") * (col("sa") + col("sb")) - col("sa") * col("sb") * 2)
                  .cast("double"), 6)).as("ari"))
    },
    Some(s"""WITH $contingencySql,
            am AS (SELECT CAST(SUM(CAST(ai AS HUGEINT) * (ai - 1) // 2)
                     AS HUGEINT) AS sa,
                     COUNT(*) AS k_clusters
                   FROM (SELECT cid, CAST(SUM(nij) AS BIGINT) AS ai
                         FROM ct GROUP BY 1)),
            bm AS (SELECT CAST(SUM(CAST(bj AS HUGEINT) * (bj - 1) // 2)
                     AS HUGEINT) AS sb,
                     COUNT(*) AS n_labels
                   FROM (SELECT label, CAST(SUM(nij) AS BIGINT) AS bj
                         FROM ct GROUP BY 1)),
            cl AS (SELECT CAST(SUM(CAST(nij AS HUGEINT) * (nij - 1) // 2)
                     AS HUGEINT) AS sij,
                     CAST(SUM(nij) AS BIGINT) AS n FROM ct),
            pu AS (SELECT CAST(SUM(mx) AS BIGINT) AS pure FROM
                     (SELECT cid, MAX(nij) AS mx FROM ct GROUP BY 1)),
            x AS (SELECT cl.*, am.*, bm.*, pu.*,
                    CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS HUGEINT) AS t
                  FROM cl CROSS JOIN am CROSS JOIN bm CROSS JOIN pu)
            SELECT n, k_clusters, n_labels,
              (pure * 1000000) // n AS purity_micro,
              CASE WHEN t * (sa + sb) - sa * sb * 2 = 0 THEN 1.0
                ELSE CAST(FLOOR(CAST(t * sij * 2 - sa * sb * 2 AS DOUBLE)
                  / CAST(t * (sa + sb) - sa * sb * 2 AS DOUBLE)
                  * 1000000.0) AS DOUBLE) / 1000000.0
              END AS ari
            FROM x""")
  )

  // --------------------------------------------------------------- q239
  /** NORMALIZED MUTUAL INFORMATION between the geometric clustering and
    * the labels — [[q238]]'s information-theoretic twin (ARI counts
    * pairs; NMI weighs the full confusion structure, and is the metric
    * that stays meaningful when cluster counts differ from label
    * counts). q203's micro-nat contract: per-cell contributions
    * nij·⌊ln(n·nij/(ai·bj))·10⁶⌋ are exact longs, entropies likewise,
    * and NMI = MI/max(H_c, H_l) is ONE division of two exact integers
    * (identically scaled, so the scale cancels). Degenerate max-entropy
    * 0 (single cluster AND single label) pins NMI to 1.
    */
  val q239 = QuerySpec(
    "q239_cluster_nmi",
    (s, d) => {
      val ct = graft.core.Materialize(kmeansVsLabel(s, d)
        .groupBy("cid", "label").agg(count(lit(1)).as("nij")))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("cid")
      val wl = org.apache.spark.sql.expressions.Window.partitionBy("label")
      val g = ct
        .withColumn("ai", sum("nij").over(wc))
        .withColumn("bj", sum("nij").over(wl))
        .crossJoin(broadcast(ct.agg(sum("nij").cast("long").as("n"))))
      val mi = g.agg(
        sum(col("nij") * floor(log((col("n") * col("nij")).cast("double") /
          (col("ai") * col("bj")).cast("double")) * lit(1e6)).cast("long"))
          .cast("long").as("mi_c"),
        max("n").as("n"))
      val hc = ct.groupBy("cid").agg(sum("nij").cast("long").as("ai"))
        .crossJoin(broadcast(ct.agg(sum("nij").cast("long").as("n"))))
        .agg(sum(col("ai") * floor(log(col("n").cast("double") /
          col("ai").cast("double")) * lit(1e6)).cast("long"))
          .cast("long").as("hc_c"))
      val hl = ct.groupBy("label").agg(sum("nij").cast("long").as("bj"))
        .crossJoin(broadcast(ct.agg(sum("nij").cast("long").as("n"))))
        .agg(sum(col("bj") * floor(log(col("n").cast("double") /
          col("bj").cast("double")) * lit(1e6)).cast("long"))
          .cast("long").as("hl_c"))
      mi.crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
        .select(col("n"),
          ffloor(col("mi_c").cast("double") /
            (col("n").cast("double") * lit(1e6)), 6).as("mi_nats"),
          when(greatest(col("hc_c"), col("hl_c")) === 0, lit(1.0))
            .otherwise(ffloor(col("mi_c").cast("double") /
              greatest(col("hc_c"), col("hl_c")).cast("double"), 6))
            .as("nmi"))
    },
    Some(s"""WITH $contingencySql,
            n AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM ct),
            g AS (
              SELECT ct.cid, ct.label, ct.nij,
                CAST(SUM(nij) OVER (PARTITION BY cid) AS BIGINT) AS ai,
                CAST(SUM(nij) OVER (PARTITION BY label) AS BIGINT) AS bj,
                n.n
              FROM ct CROSS JOIN n),
            mi AS (
              SELECT CAST(SUM(nij * CAST(FLOOR(ln(CAST(n * nij AS DOUBLE)
                  / CAST(ai * bj AS DOUBLE)) * 1000000.0) AS BIGINT))
                  AS BIGINT) AS mi_c,
                MAX(n) AS n
              FROM g),
            hc AS (
              SELECT CAST(SUM(ai * CAST(FLOOR(ln(CAST(n AS DOUBLE)
                  / CAST(ai AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT)
                  AS hc_c
              FROM (SELECT cid, CAST(SUM(nij) AS BIGINT) AS ai
                    FROM ct GROUP BY 1) CROSS JOIN n),
            hl AS (
              SELECT CAST(SUM(bj * CAST(FLOOR(ln(CAST(n AS DOUBLE)
                  / CAST(bj AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT)
                  AS hl_c
              FROM (SELECT label, CAST(SUM(nij) AS BIGINT) AS bj
                    FROM ct GROUP BY 1) CROSS JOIN n)
            SELECT n,
              CAST(FLOOR(CAST(mi_c AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                * 1000000.0) AS DOUBLE) / 1000000.0 AS mi_nats,
              CASE WHEN GREATEST(hc_c, hl_c) = 0 THEN 1.0
                ELSE CAST(FLOOR(CAST(mi_c AS DOUBLE)
                  / CAST(GREATEST(hc_c, hl_c) AS DOUBLE) * 1000000.0) AS DOUBLE)
                  / 1000000.0
              END AS nmi
            FROM mi CROSS JOIN hc CROSS JOIN hl""")
  )

  // --------------------------------------------------------------- q240
  /** K-DIST PROFILE — the ε-selection table for [[q236]]: the classic
    * DBSCAN recipe reads ε off the knee of the sorted k-th-NN-distance
    * curve; at corpus scale nobody sorts that curve — they read its
    * QUANTILES. Per vector: the 3rd-smallest cosine distance (1 − cos,
    * micro-floored to exact longs) among its block pairs; then exact
    * p50/p90/p99 of those k-dists — p90 is the standard suggested ε.
    * Distances ride [[q141]]'s blocked pair join; the per-vector rank-3
    * pick is a width-bounded window (block-bounded, never a corpus
    * stratum); the quantile ranks are exact (ceil(p·n/100), id-free —
    * values are already integers).
    */
  val q240 = QuerySpec(
    "q240_kdist_profile",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("label"), col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0) // zero-norm excluded up front (q209's rule)
      val a = e.select(col("label"), col("vec_id").as("id1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
      val b = e.select(col("label"), col("vec_id").as("id2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
      val distMicro = (lit(1000000L) -
        floor(cosineFromParts(dot(col("e1"), col("e2")), col("n1"), col("n2"))
          * lit(1e6)).cast("long"))
      val pairs = a.join(b, Seq("label"))
        .filter(col("id1") =!= col("id2"))
        .select(col("id1").as("id"), distMicro.as("dm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("dm")
      val kdist = graft.core.Materialize(
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 3).select(col("id"), col("dm")))
      // exact ranks WITHOUT a global sort: q118's histogram-refine engine
      graft.operators.Quantiles
        .exactQuantiles(kdist, "dm", Seq(50, 90, 99), refineThreshold = 4096)
        .select(col("pct"), col("k"),
          col("value").cast("long").as("kdist_micro"))
        .orderBy("pct")
    },
    Some(s"""WITH e AS (
              SELECT label, vec_id, embedding, nrm FROM (
                SELECT label, vec_id, embedding,
                  sqrt(${dotSql("embedding", "embedding")}) AS nrm
                FROM embeddings)
              WHERE nrm > 0),
            pairs AS (
              SELECT a.vec_id AS id,
                1000000 - CAST(FLOOR(${dotSql("a.embedding", "b.embedding")}
                  / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS dm
              FROM e a JOIN e b
                ON a.label = b.label AND a.vec_id <> b.vec_id),
            kd AS (
              SELECT id, dm FROM (
                SELECT id, dm,
                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY dm) AS rn
                FROM pairs)
              WHERE rn = 3),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM kd),
            t(pct) AS (VALUES (50), (90), (99)),
            ks AS (SELECT pct, CAST((pct * n + 99) // 100 AS BIGINT) AS k
                   FROM t CROSS JOIN n),
            r AS (SELECT dm, ROW_NUMBER() OVER (ORDER BY dm) AS rn FROM kd)
            SELECT ks.pct, ks.k, CAST(r.dm AS BIGINT) AS kdist_micro
            FROM ks JOIN r ON r.rn = ks.k
            ORDER BY ks.pct""")
  )

  val all: Seq[QuerySpec] =
    Seq(q173, q178, q185, q189, q192, q194, q236, q237, q238, q239, q240)
}
