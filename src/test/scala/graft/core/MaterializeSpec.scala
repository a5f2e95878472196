package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.llmops.Dedup

/** The materialization strategy hook: all three modes must produce the
  * same answers (they differ only in failure tolerance), and the unknown
  * mode must fail loudly rather than silently recompute.
  */
class MaterializeSpec extends SparkTestBase {

  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different tokens nothing shared here at all folks today"))
      .toDF("doc_id", "text")
  }

  private def runNearDup(): Seq[(Long, Long)] =
    Dedup.minhashPairs(Materialize(Dedup.minhashSignatures(docs(), 3)), minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("local, reliable, and persist modes return identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val results = Seq("local", "reliable", "persist").map { mode =>
      spark.conf.set(Materialize.ModeKey, mode)
      try runNearDup() finally spark.conf.unset(Materialize.ModeKey)
    }
    assert(results.forall(_ == Seq((1L, 2L))), s"per-mode results: $results")
  }

  test("reliable mode actually writes to the checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Materialize.ModeKey, "reliable")
    try {
      assert(runNearDup() == Seq((1L, 2L)))
      assert(listFiles(dir).nonEmpty, "no reliable checkpoint files written")
    } finally spark.conf.unset(Materialize.ModeKey)
  }

  test("unknown mode fails fast") {
    spark.conf.set(Materialize.ModeKey, "bogus")
    try intercept[IllegalArgumentException](Materialize(docs()))
    finally spark.conf.unset(Materialize.ModeKey)
  }

  test("requireIterationSafe: live lazy fixpoint input under persist mode gets the loud require, not the analyzer OOM") {
    import spark.implicits._
    // the round-12 caveat, now mechanical: persist never truncates
    // lineage, so a fixpoint nests its input plan ~4x into every round —
    // a bounded-composition input is safe (the DedupGraphSpec persist pin
    // legitimately enters at 8,225 nodes and passes), but the
    // unbounded-feedback class (a previous fixpoint's live output fed
    // back, ~100k+ nodes) OOMs the analyzer. Land a tiny edge table,
    // then union-double it 16 times: ~131k logical nodes, the failure
    // class's shape and size.
    val dir = java.nio.file.Files.createTempDirectory("graft-itersafe").toString
    Seq((1L, 2L), (2L, 1L)).toDF("src", "dst").write.parquet(s"$dir/edges")
    val landed = spark.read.parquet(s"$dir/edges")
    spark.conf.set(Materialize.ModeKey, "persist")
    try {
      Materialize.requireIterationSafe(landed, "test") // storage-backed: fine
      var live = landed
      (1 to 16).foreach(_ => live = live.union(live))
      val e = intercept[IllegalArgumentException](
        Materialize.requireIterationSafe(live, "ccFixpoint(edges)"))
      assert(e.getMessage.contains("persist") && e.getMessage.contains("parquet"))
      // ...and through the real entry points, BEFORE any round runs
      intercept[IllegalArgumentException](
        graft.llmops.DedupGraph.connectedComponents(live))
      intercept[IllegalArgumentException](
        graft.llmops.DedupGraph.kCoreFixpoint(live, 2))
      // other modes truncate lineage per round: no-op even on the huge plan
      spark.conf.set(Materialize.ModeKey, "local")
      Materialize.requireIterationSafe(live, "test")
    } finally spark.conf.unset(Materialize.ModeKey)
  }
}
