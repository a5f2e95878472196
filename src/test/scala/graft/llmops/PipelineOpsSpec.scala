package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic coverage for the round-3 pipeline operators beyond the
  * driver's hash gate: redaction edge cases the synthetic corpus can't
  * produce, packing block arithmetic, and the k-NN vote tie-break.
  */
class PipelineOpsSpec extends SparkTestBase {

  test("redactPii: multiple occurrences, all three types, order-independence of leftovers") {
    import spark.implicits._
    val s = "mail a@b.co and c.d-e@f.org.uk ip 1.2.3.4 then 255.255.255.255 call 555-0000 555-9999 end"
    val out = Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("c")).head().getString(0)
    assert(out == "mail <EMAIL> and <EMAIL> ip <IP> then <IP> call <PHONE> <PHONE> end")
  }

  test("redactPii: email swallowed before IP/phone patterns can split it") {
    import spark.implicits._
    // digits+dots inside an email must redact as ONE email, not leak an <IP>
    val out = Seq(Tuple1("x 10.0.0.7@host.example.com y")).toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("c")).head().getString(0)
    assert(out == "x <EMAIL> y")
    // and clean text is untouched
    val clean = Seq(Tuple1("nothing to redact here 555 1.2 a@b")).toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("c")).head().getString(0)
    assert(clean == "nothing to redact here 555 1.2 a@b")
  }

  test("sequence packing: block counts and straddle arithmetic") {
    import spark.implicits._
    // ids 0,16,32,48 share shard 0 → ONE pack stream; token counts are
    // sized so exactly one doc (the 100-token one, entering at cum 2000)
    // straddles the first 2048-token block boundary
    val docs = Seq(
      (0L, Seq.fill(2000)("w").mkString(" "), "en", "s1", 1L),
      (16L, Seq.fill(100)("w").mkString(" "), "en", "s1", 1L),  // straddles 2048
      (32L, Seq.fill(40)("w").mkString(" "), "en", "s1", 1L),
      (48L, Seq.fill(8)("w").mkString(" "), "en", "s1", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("pack").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.QueryRegistry.byName("q64_sequence_packing")
      .run(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // source, shard, n_docs, total_tokens, n_blocks, n_straddle
    assert(r.getLong(2) == 4)
    assert(r.getLong(3) == 2148)
    assert(r.getLong(4) == 2) // ceil(2148/2048)
    assert(r.getLong(5) == 1) // only doc 16 crosses the 2048 boundary
  }

  test("knn label vote: majority wins, ties break to smaller label") {
    import spark.implicits._
    // embed on a line: queries at x=0; neighbors split between labels so
    // the vote is exercised, not just the distance ranking
    val dim = 4
    def v(x: Float) = Seq(x, 1.0f, 0.0f, 0.0f)
    val rows =
      Seq((0L, v(0.0f), 9)) ++                       // query, label ignored
        (10L to 16L).map(i => (i, v(0.1f), 1)) ++     // 7 near, label 1
        (20L to 27L).map(i => (i, v(0.15f), 2)) ++    // 8 near, label 2
        (30L to 60L).map(i => (i, v(100f), 3))        // far, label 3
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.QueryRegistry.byName("q67_knn_label").run(spark, dir).collect()
    assert(out.length == 1)
    // k=15 nearest = the 7 label-1 + 8 label-2 docs → label 2 wins 8:7
    assert(out.head.getInt(1) == 2 && out.head.getLong(2) == 8L)
  }

  test("neardup clusters: components within 3 hops collapse to min id") {
    import spark.implicits._
    // docs sharing a rare 5-gram: chain 1-2-3-4 (each adjacent pair shares
    // a distinct 5-gram) + isolated pair 10-11 + singleton 20
    def doc(id: Long, t: String) = (id, t, "en", "s", t.length.toLong)
    val g1 = "alpha beta gamma delta epsilon"
    val g2 = "zeta eta theta iota kappa"
    val g3 = "lam mu nu xi omicron"
    val g4 = "pi rho sigma tau upsilon"
    val docs = Seq(
      doc(1L, s"$g1 one filler words here"),
      doc(2L, s"$g1 and also $g2"),
      doc(3L, s"$g2 and also $g3"),
      doc(4L, s"$g3 tail tokens here now"),
      doc(10L, s"$g4 first copy of pair"),
      doc(11L, s"$g4 second copy of pair"),
      doc(20L, "nothing shared with anyone at all here")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("cc").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.QueryRegistry.byName("q69_neardup_clusters").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 1-2-3-4 is within 3 hops of node 1 → one cluster labeled 1
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L && out(4L) == 1L)
    assert(out(10L) == 10L && out(11L) == 10L)
    assert(!out.contains(20L)) // edge-free docs never enter the label table
  }

  test("corpus profile: exact stats on a known corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "d e", "en", "s", 2L),
      (3L, "f", "fr", "s", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("prof").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.QueryRegistry.byName("q66_corpus_profile").run(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("en") == ((2L, 5L, 3.5, 3.5))) // tokens 3+2, chars avg/median 3.5
    assert(out("fr") == ((1L, 1L, 9.0, 9.0)))
  }
}
