package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 release/index operators: q173's Lloyd
  * assignment must send every vector to its geometrically nearest seed
  * (checked on a corpus with planted clusters), and q170's DP release must
  * be deterministic, actually-noised, and conserve the audit column.
  */
class ReleaseOpsSpec extends SparkTestBase {

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("release-ops").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q173: every vector lands on its nearest seed; counts and inertia check out") {
    // seeds 0..3 = scaled unit vectors e0..e3; vectors 4..15 are small
    // perturbations of seed (i % 4) — nearest-centroid is unambiguous
    def unit(axis: Int, scale: Float, dim: Int = 8): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == axis) scale else 0.0f)
    val rows = (0 until 4).map(i => (i.toLong, unit(i, 10.0f), i)) ++
      (4 until 16).map { i =>
        val c = i % 4
        (i.toLong, unit(c, 10.0f).updated((c + 4) % 8, 0.5f), c)
      }
    val out = Clustering.q173.run(spark, embDir(rows)).collect()
    assert(out.length == 4)
    val byCid = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byCid.keySet == Set(0L, 1L, 2L, 3L))
    // 1 seed + 3 perturbed per cluster
    assert(byCid.values.forall(_._1 == 4L), s"assignment: $byCid")
    // each perturbed vector sits at squared distance 0.25 from its seed;
    // seeds are at 0 → inertia = 3 * 0.25 in micro-units per cluster
    assert(byCid.values.forall(_._2 == 750000L), s"inertia: $byCid")
  }

  test("q170: DP release is deterministic, noised, and keeps the true count") {
    val dir = sf("sf0.001")
    val a = PrivacyOps.q170.run(spark, dir).collect()
    val b = PrivacyOps.q170.run(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "inverse-CDF noise must be run-stable")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getDouble(3) == 1.0) // epsilon column
      val n = r.getLong(1).toDouble
      val noisy = r.getDouble(2)
      // Laplace(1) noise: |noise| beyond 25 has probability e^-25 — any
      // larger gap means the inverse-CDF map is broken
      assert(math.abs(noisy - n) < 25.0, s"noise out of range: $r")
    }
    // at least one source must actually be perturbed
    assert(a.exists(r => r.getDouble(2) != r.getLong(1).toDouble))
  }
}
