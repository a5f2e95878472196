package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The incremental-dedup contract: a batch deduped against the PERSISTED
  * signature store answers identically to the relational store/batch
  * forms (q73/q74), and appending the batch makes the next increment see
  * it. Candidate semantics vs a full batch-inclusive q30 run are checked
  * on the real sf corpus.
  */
class IncrementalDedupSpec extends SparkTestBase {

  private def corpus = graft.Tables.documents(spark, sf("sf0.001"))

  test("persisted store answers the exact increment identically to the relational q73 form") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val store = corpus.filter(col("doc_id") % 5 =!= 0)
    val batch = corpus.filter(col("doc_id") % 5 === 0)
    IncrementalDedup.buildStore(store, dir, prefixTokens = Some(8))

    val fromStore = IncrementalDedup
      .exactDups(spark.read.parquet(s"$dir/fingerprints.parquet"), batch,
        prefixTokens = Some(8))
      .orderBy("doc_id").collect().toSeq
    val relational = graft.QueryRegistry.byName("q73_incremental_exact_dedup")
      .run(spark, sf("sf0.001")).collect().toSeq
    assert(fromStore == relational)
    assert(fromStore.nonEmpty) // head-fp collisions exist — not a vacuous pass

    // exactNew is the complement: hits + news partition the batch
    val news = IncrementalDedup
      .exactNew(spark.read.parquet(s"$dir/fingerprints.parquet"), batch,
        prefixTokens = Some(8))
    assert(news.count() + fromStore.size == batch.count())
    assert(news.columns.toSeq == batch.columns.toSeq)
  }

  test("persisted store answers the near-dup increment identically to the relational q74 form") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val store = corpus.filter(col("doc_id") % 5 =!= 0)
    val batch = corpus.filter(col("doc_id") % 5 === 0)
    IncrementalDedup.buildStore(store, dir)

    val (_, near) = IncrementalDedup.dedupeBatch(spark, dir, batch)
    val fromStore = near.orderBy("d1", "d2").collect().toSeq
    val relational = graft.QueryRegistry.byName("q74_incremental_neardup")
      .run(spark, sf("sf0.001")).collect().toSeq
    assert(fromStore == relational)

    // batch-vs-store pairs are exactly the cross-split subset of the
    // full-corpus q30 pairs at the same threshold (same bands, same cap
    // applied store-side only — every cross pair q30 finds with its
    // union-side cap must also collide here or be a cap casualty; on
    // this corpus the bucket cap never binds, so the sets are equal)
    val full = Dedup.minhashPairs(
        graft.core.Materialize(Dedup.minhashSignatures(corpus, 3)), minSim = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cross = full.filter { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b, j) => if (a % 5 == 0) (a, b, j) else (b, a, j) }
    val got = fromStore.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == cross)
  }

  test("appendToStore: the next increment sees the previous batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val store = corpus.filter(col("doc_id") % 5 =!= 0)
    IncrementalDedup.buildStore(store, dir)

    // batch 1 lands; its docs then shadow batch 2's exact copy
    val batch1 = corpus.filter(col("doc_id") % 5 === 0)
    IncrementalDedup.appendToStore(batch1, dir)
    val copyId = batch1.select(min("doc_id")).as[Long].head()
    val copyText = batch1.filter(col("doc_id") === copyId)
      .select("text").as[String].head()
    val batch2 = Seq((900001L, copyText, "en", "src0", copyText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val (exact, near) = IncrementalDedup.dedupeBatch(spark, dir, batch2)
    val hit = exact.collect()
    assert(hit.length == 1 && hit.head.getLong(0) == 900001L)
    // near-dup sees it too (identical text → est 1.0 against the landed copy)
    assert(near.filter(col("d2") === copyId && col("est_jaccard") === 1.0).count() == 1)
  }
}
