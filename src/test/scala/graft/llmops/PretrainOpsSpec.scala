package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the pre-training planning operators on controlled
  * corpora (the hash-oracle proves engine parity; these prove the
  * operators measure what they claim).
  */
class PretrainOpsSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pretrain").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q84: common-token docs score below rare-token docs; frequent corpus ranks sanely") {
    // "the" appears 12x in the corpus, each rare word once: a doc of "the"s
    // has near-zero surprisal, a doc of hapaxes is maximal
    val dir = docsDir(Seq(
      (1L, "the the the the the the the the", "en", "s", 8L),
      (2L, "zebra quark fjord nymph vex jolt wisp glyph", "en", "s", 8L),
      (3L, "the the the the zebra2 quark2 fjord2 nymph2", "en", "s", 8L)))
    val out = PretrainOps.q84.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 8L)
    val (s1, s2, s3) = (out(1L)._2, out(2L)._2, out(3L)._2)
    assert(s1 < s3 && s3 < s2, s"expected monotone surprisal, got $s1 $s3 $s2")
    assert(s1 >= 0.0)
    // doc 2 is all hapaxes: mean surprisal = ln(N/1) with N=24 tokens,
    // truncated — check against the closed form
    assert(math.abs(s2 - math.log(24.0)) < 1e-3)
  }

  test("q85: exact copy keeps nothing, unique doc keeps everything, partial overlap in between") {
    val base = (1 to 120).map(i => s"tok$i").mkString(" ") // 120 tokens = 3 chunks of 50
    val uniq = (1 to 120).map(i => s"other$i").mkString(" ")
    val halfNew = ((1 to 50).map(i => s"tok$i") ++ (1 to 50).map(i => s"fresh$i")).mkString(" ")
    val dir = docsDir(Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, base, "en", "s", base.length.toLong),      // exact copy, later id
      (3L, uniq, "en", "s", uniq.length.toLong),
      (4L, halfNew, "en", "s", halfNew.length.toLong)))
    val out = PretrainOps.q85.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))   // first occurrence owns all its chunks
    assert(out(2L) == ((3L, 0L, 0.0)))   // the copy owns none
    assert(out(3L) == ((3L, 3L, 1.0)))   // unique content untouched
    assert(out(4L)._1 == 2L && out(4L)._2 == 1L) // chunk 1 = doc 1's chunk 1; chunk 2 fresh
  }

  test("q86: budget conserved, caps respected, equal-share redistribution") {
    // src a: 1000 tokens, src b: 100 (will cap at 200), src c: 900
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, words(1000, "a"), "en", "srcA", 1L),
      (2L, words(100, "b"), "en", "srcB", 1L),
      (3L, words(900, "c"), "en", "srcC", 1L)))
    val out = PretrainOps.q86.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = 2000L
    val budget = total * 6 / 10 // 1200
    val bylabel = out.map(r => r._1 -> r).toMap
    // fair = 400; B caps at 200; leftover 200 split equally (100 each) to A and C
    assert(bylabel("srcA") == (("srcA", 1000L, 500L, 500L)))
    assert(bylabel("srcB") == (("srcB", 100L, 200L, 2000L)))
    assert(bylabel("srcC") == (("srcC", 900L, 500L, 555L)))
    assert(out.map(_._3).sum == budget)          // fully allocated here
    out.foreach { case (_, avail, alloc, em) =>
      assert(alloc <= 2 * avail && em <= 2000L)  // epoch cap everywhere
    }
  }

  test("q88: identical sources give jaccard 1, disjoint pairs are absent, partial overlap exact") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")   // 6 distinct 5-grams
    val other = (1 to 10).map(i => s"o$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, shared, "en", "srcA", 1L),
      (2L, shared, "en", "srcB", 1L),  // B == A exactly
      (3L, other, "en", "srcC", 1L)))  // C disjoint from both
    val out = PretrainOps.q88.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(("srcA", "srcB"))) // zero-overlap pairs absent
    assert(out(("srcA", "srcB")) == ((6L, 1.0)))
  }

  test("q89: spectrum conserves types and token mass, buckets are frequency bit widths") {
    // "the" x5 (bucket 3), "a" x2 (bucket 2), 3 hapaxes (bucket 1)
    val dir = docsDir(Seq(
      (1L, "the the the a zebra", "en", "s", 1L),
      (2L, "the the a quark fjord", "en", "s", 1L)))
    val out = PretrainOps.q89.run(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1 -> ((3L, 3L)), 2 -> ((1L, 2L)), 3 -> ((1L, 5L))))
    assert(out.values.map(_._2).sum == 10L) // token mass == corpus tokens
  }

  test("q90: byte/char/token ratios are exact on ascii and multibyte text") {
    val dir = docsDir(Seq(
      (1L, "ab cd", "en", "s", 1L),        // 2 tokens, 5 chars, 5 bytes
      (2L, "éé éé", "fr", "s", 1L))) // 2 tokens, 5 chars, 9 bytes (é = 2 bytes)
    val out = PretrainOps.q90.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out("en") == ((1L, 2L, 5L, 5L, 2.5, 1.0)))
    assert(out("fr") == ((1L, 2L, 5L, 9L, 2.5, 1.8)))
  }

  test("q117: span lengths are Poisson(3)-distributed, spans stay in-segment") {
    import org.apache.spark.sql.functions._
    val out = graft.QueryRegistry.byName("q117_span_corruption")
      .run(spark, sf("sf0.01")).collect()
    // variable lengths: n_corrupted is no longer always 3×n_spans
    val fixed = out.count(r => r.getLong(3) == 3 * r.getLong(2))
    assert(fixed < out.length, "every doc still has 3-token spans — lengths not variable")
    // mean span length ≈ 3 (law of large numbers over ~2k spans)
    val mean = out.map(_.getLong(3)).sum.toDouble / out.map(_.getLong(2)).sum
    assert(mean > 2.6 && mean < 3.4, s"mean span length $mean not ≈ 3")
    // per-doc corruption stays near the 15% target (len is capped at 8
    // and seg ≥ 20, so the fraction cannot run away)
    out.foreach { r =>
      val frac = r.getDouble(4)
      assert(frac > 0.02 && frac < 0.45, s"doc ${r.getLong(0)} corrupt_frac $frac")
    }
    // the length distribution has real spread (≥4 distinct lengths among
    // per-doc means would be too coarse; recompute the exact len draw)
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val lens = docs
      .select(col("doc_id"),
        size(split(graft.operators.Ops.asciiLower(col("text")), " ")).cast("long").as("n"))
      .filter(col("n") >= 20)
      .withColumn("n_spans", greatest(lit(1L), expr("(n * 15 div 100) div 3")))
      .withColumn("seg", expr("n div n_spans"))
      .select(col("doc_id"), col("seg"),
        explode(sequence(lit(0L), col("n_spans") - 1)).as("k"))
      .withColumn("u",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":len"),
          col("k").cast("string"))), 1, 8), 16, 10).cast("long") / lit(4294967296.0))
      .withColumn("len",
        least(when(col("u") < 0.19914827347145578, 1L)
          .when(col("u") < 0.42319008112684353, 2L)
          .when(col("u") < 0.6472318887822313, 3L)
          .when(col("u") < 0.8152632445237721, 4L)
          .when(col("u") < 0.9160820579686966, 5L)
          .when(col("u") < 0.9664914646911589, 6L)
          .when(col("u") < 0.9880954961436427, 7L)
          .otherwise(lit(8L)), col("seg") - 2))
      .groupBy("len").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lens.keySet.size >= 6, s"only lengths ${lens.keySet} drawn")
    val total = lens.values.sum.toDouble
    // observed frequencies track the folded-Poisson pmf within noise
    assert(math.abs(lens.getOrElse(1L, 0L) / total - 0.199) < 0.05)
    assert(math.abs(lens.getOrElse(3L, 0L) / total - 0.224) < 0.05)
  }

  test("q87: buckets are bit widths, doc counts conserve, pad math is exact") {
    val dir = docsDir(Seq(
      (1L, (1 to 7).map(_ => "w").mkString(" "), "en", "s", 1L),    // 7 tok  -> bucket 3
      (2L, (1 to 8).map(_ => "w").mkString(" "), "en", "s", 1L),    // 8 tok  -> bucket 4
      (3L, (1 to 600).map(_ => "w").mkString(" "), "en", "s", 1L))) // 600 tok -> bucket 10, 2 seqs
    val out = PretrainOps.q87.run(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(3, 4, 10))
    assert(out(3) == ((1L, 7L, 1L, 505L)))
    assert(out(4) == ((1L, 8L, 1L, 504L)))
    assert(out(10) == ((1L, 600L, 2L, 424L))) // 2*512 - 600
    assert(out.values.map(_._1).sum == 3L)
  }

  test("q171: CDC boundaries survive a prepended token (<=1 chunk hash differs)") {
    // doc 2 = one junk token + doc 1's exact text. Content-defined
    // boundaries depend only on token hashes, so every chunk AFTER the
    // first boundary is byte-identical between the two docs — the
    // property fixed-size chunking (q48/q124) structurally lacks.
    val text = (1 to 300).map(i => s"tk$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, text, "en", "s", text.length.toLong),
      (2L, "zzz " + text, "en", "s", text.length.toLong + 4)))
    val chunks = PretrainViews.cdcChunks(
        graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("cmd5")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    val a = chunks(1L); val b = chunks(2L)
    assert(a.size > 5, s"need several boundaries in 300 tokens, got ${a.size}")
    // multiset difference in each direction is at most the head chunk
    def msetDiff(x: Seq[String], y: Seq[String]): Int = {
      val yc = scala.collection.mutable.Map(
        y.groupBy(identity).view.mapValues(_.size).toSeq: _*)
      x.count { h =>
        val left = yc.getOrElse(h, 0)
        if (left > 0) { yc(h) = left - 1; false } else true
      }
    }
    assert(msetDiff(a, b) <= 1, "prepend must perturb at most the head chunk")
    assert(msetDiff(b, a) <= 1)

    // contrast: the fixed-size chunker shifts EVERY boundary — q124 md5s
    // on the same pair share (almost) nothing
    val fixedA = PretrainViews.q124.run(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(4)).toSeq).toMap
    assert(msetDiff(fixedA(1L), fixedA(2L)) >= fixedA(1L).size - 1,
      "fixed-size chunking should lose alignment after a prepend")
  }
}
