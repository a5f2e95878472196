package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 additions, on corpora crafted to
  * separate each operator from its nearest neighbour: q186 edit-distance
  * verify (edit-variants pass, phrase-sharers fail), q187 k-core peeling
  * (chains dissolve, cliques survive), q188 suffix→prefix stitching
  * (continuations found, no spurious pairs), q189 JL sign projection
  * (exact hash-derived signs, verified against an independent JVM md5),
  * and q190 interval-overlap (a constructed burst inside a session).
  * The DuckDB hash oracle proves engine parity on sf data; these prove
  * the SEMANTICS.
  */
class Round6OpsSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("round6ops").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def row(id: Long, text: String) =
    (id, text, "en", "src0", text.length.toLong)

  test("q187: chain dissolves under 2-core peeling, clique survives intact") {
    // path 0-1-…-5 (consecutive docs share one rare 5-gram) + K4 clique
    // (docs 100-103 all contain the same 5-gram → all pairs adjacent)
    def span(i: Int) = (1 to 5).map(t => s"w${i}x$t").mkString(" ")
    val chain = (0 until 6).map(i => row(i.toLong, span(i) + " " + span(i + 1)))
    val kg = "k1 k2 k3 k4 k5"
    val clique = (0 until 4).map(j =>
      row(100L + j, kg + " " + (1 to 5).map(t => s"u${j}f$t").mkString(" ")))
    val dir = docsDir(chain ++ clique)
    val got = DedupGraph.q187.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L) == ((10L, 11L)), s"round 0: $got")  // 6+4 nodes, 5+6 edges
    assert(got(1L) == ((8L, 9L)))   // chain endpoints peeled
    assert(got(2L) == ((6L, 7L)))   // next pair peeled
    assert(got(3L) == ((4L, 6L)), "after 3 peels only the K4 core remains")
  }

  test("q188: a genuine continuation pair is found; nothing spurious") {
    val a = "a1 a2 a3 b1 b2 b3"            // tail gram b1_b2_b3 at pos 3
    val b = "b1 b2 b3 c1 c2 c3"            // head gram b1_b2_b3
    val noise = Seq(row(9L, "z1 z2 z3 z4 z5"), row(8L, "y1 y2 y3 y4 y5"))
    val dir = docsDir(Seq(row(1L, a), row(2L, b)) ++ noise)
    val got = DedupGraph.q188.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, "b1_b2_b3", 3L)), got.mkString(","))
  }

  test("q186: edit-variants verify, phrase-sharers are rejected") {
    // pair (1,2): share gram g1, differ by ONE token → tiny edit distance.
    // pair (3,4): share gram g2, then diverge completely → prefix edit
    // distance far above the 30 cutoff. Both pairs ARE candidate edges.
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")          // >120 chars
    val variant = base.replace("tok9", "tokX")
    val g2 = "g1 g2 g3 g4 g5"
    val far1 = g2 + " " + (1 to 20).map(i => s"aaaaaa$i").mkString(" ")
    val far2 = g2 + " " + (1 to 20).map(i => s"zzzzzz$i").mkString(" ")
    val dir = docsDir(Seq(row(1L, base), row(2L, variant),
      row(3L, far1), row(4L, far2)))
    val edges = Dedup.neardupEdges(graft.Tables.documents(spark, dir))
      .filter(col("src") < col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (3L, 4L)), s"candidate fixture broken: $edges")
    val got = DedupAudit.q186.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L)
    assert(got.head._3 <= 4L, s"one-token swap should be a small edit: $got")
  }

  test("q189: projection is exact signed sums with hash-derived signs") {
    import spark.implicits._
    val dim = 16
    def oneHot(i: Int) = Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    val dir = java.nio.file.Files.createTempDirectory("round6jl").toString
    Seq((0L, oneHot(0), "a"), (5L, oneHot(5), "a"), (7L, oneHot(7), "b"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // independent JVM reference for the md5-parity sign of (i, j)
    def sign(i: Int, j: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1L else -1L
    }
    val got = Clustering.q189.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 3 * 8)
    for (vid <- Seq(0, 5, 7); j <- 0 until 8)
      assert(got((vid.toLong, j.toLong)) == sign(vid, j) * 1000000L,
        s"one-hot e_$vid projected onto dim $j must be exactly its sign")
  }

  test("q191: small cells merge into __other__, large cells release; totals reconcile") {
    // 12 docs in (s0, en) → released; 3 in (s1, en) + 2 in (s1, de) → merged
    val rows = (0 until 12).map(i => (i.toLong, s"t$i x", "en", "s0", 10L)) ++
      (0 until 3).map(i => (100L + i, s"u$i y", "en", "s1", 20L)) ++
      (0 until 2).map(i => (200L + i, s"v$i z", "de", "s1", 30L))
    val dir = docsDir(rows)
    val got = PrivacyOps.q191.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("s0", "en")) == ((12L, 120L, 0L)))
    assert(got(("__other__", "__other__")) == ((5L, 120L, 2L)),
      "suppressed cells must merge with exact totals and a merge count")
    assert(!got.keySet.exists(_._1 == "s1"), "sub-k cells must not release")
    // totals reconcile: released + other == corpus
    assert(got.values.map(_._1).sum == 17L)
  }

  test("q192: power iteration converges to the planted dominant direction, exactly") {
    import spark.implicits._
    // Gram matrix diag(1, 0, 3, 0): e2 dominates; with v0 = 1-vector the
    // max-norm trace is closed-form: v1 = (333333, 0, 1e6, 0),
    // v2 = (111111, 0, 1e6, 0) — the (1/3)^t contraction, floor-divided.
    val dir = java.nio.file.Files.createTempDirectory("round6pow").toString
    Seq((0L, Array(1.0f, 0f, 0f, 0f), "a"), (1L, Array(0f, 0f, 1.0f, 0f), "a"),
      (2L, Array(0f, 0f, 1.0f, 0f), "a"), (3L, Array(0f, 0f, 1.0f, 0f), "a"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Clustering.q192.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) == 333333L && got((1L, 2L)) == 1000000L)
    assert(got((1L, 1L)) == 0L && got((1L, 3L)) == 0L)
    assert(got((2L, 0L)) == 111111L && got((2L, 2L)) == 1000000L,
      s"second iteration must contract the off-axis component by 1/3: $got")
  }

  test("q190: a session overlapping a constructed burst is reported") {
    import spark.implicits._
    def ts(h: Int, m: Int) = new java.sql.Timestamp(
      1700000000000L / 3600000L * 3600000L + h * 3600000L + m * 60000L)
    // 'click': one 12-event hour (hour 0, users 50-61) + 12 quiet
    // one-event hours → mean ≈ 1.85/active-hour, burst = hour 0 only.
    val burst = (0 until 12).map(k =>
      (100L + k, ts(0, k * 3), 50L + k, "click", 1.0, "{}"))
    val quiet = (0 until 12).map(k =>
      (200L + k, ts(3 + k, 1), 80L, "click", 1.0, "{}"))
    // user 1's session: two events inside hour 0 → [00:05, 04:25) with
    // the 4h close → fully covers the rest of the burst hour
    val sess = Seq((1L, ts(0, 5), 1L, "view", 1.0, "{}"),
      (2L, ts(0, 25), 1L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("round6iv").toString
    (burst ++ quiet ++ sess)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Advanced.q190.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // session [00:05, 04:25) ∩ burst hour [00:00, 01:00) = 55 minutes
    assert(got.contains((1L, "click")), s"session must overlap the burst: $got")
    assert(got((1L, "click")) == ((1L, 55L * 60L * 1000000L)), s"$got")
  }
}
