package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PQ contract: codes are 32× smaller than the vectors they stand for,
  * ADC ranking recovers most of the exact top-k, and the two-stage
  * rerank path recovers (nearly) all of it. Thresholds are measured
  * values with margin, on the sf0.01 corpus (500 vectors, 64-dim).
  */
class ProductQuantSpec extends SparkTestBase {

  private lazy val e = graft.Tables.embeddings(spark, sf("sf0.01"))
  private lazy val queries = e.filter(col("vec_id") < 10)

  private def topKSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().toSeq.groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }

  test("pq: encode emits one m-byte code + exact norm per vector; deterministic") {
    val cb = ProductQuant.pqTrain(e, m = 8, k = 16, iters = 2)
    val codes = ProductQuant.pqEncode(e, cb)
    assert(codes.count() == e.count())
    val r = codes.filter(col("vec_id") === 0L).head()
    assert(r.getAs[Array[Byte]]("code").length == 8)
    assert(r.getAs[Double]("norm") > 0.0)
    // deterministic: re-train + re-encode bit-matches
    val again = ProductQuant.pqEncode(e, ProductQuant.pqTrain(e, m = 8, k = 16, iters = 2))
    assert(codes.orderBy("vec_id").collect().toSeq ==
           again.orderBy("vec_id").collect().toSeq)
  }

  test("pq: ADC top-10 recall vs exact top-10, and rerank recovers more") {
    // config measured across {m,k} grids: near-uniform synthetic vectors
    // quantize hard; m=16 x k=64 (16 B codes, 16x) is the knee
    val cb = ProductQuant.pqTrain(e, m = 16, k = 64, iters = 3)
    val codes = graft.core.Materialize(ProductQuant.pqEncode(e, cb))
    val exact = topKSets(Similarity.bruteForceTopK(queries, e, 10))
    val adc = topKSets(ProductQuant.pqTopK(codes, cb, queries, 10))
    val rr = topKSets(ProductQuant.pqTopKRerank(codes, cb, e, queries, 10, shortlist = 50))

    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) => (got.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size }
      per.sum / per.size
    }
    val adcRecall = recall(adc)
    val rrRecall = recall(rr)
    info(f"ADC recall@10 = $adcRecall%.3f, rerank(50) recall@10 = $rrRecall%.3f")
    assert(adcRecall >= 0.5, s"ADC recall too low: $adcRecall")
    assert(rrRecall >= adcRecall, "rerank must not lose recall vs ADC")
    assert(rrRecall >= 0.8, s"rerank recall too low: $rrRecall")
  }

  test("pq: over-cap query batch is rejected before any heavy work") {
    val cb = ProductQuant.pqTrain(e, m = 8, k = 16, iters = 1)
    val codes = ProductQuant.pqEncode(e, cb)
    val ex = intercept[IllegalArgumentException] {
      ProductQuant.pqTopK(codes, cb, e, topK = 5, maxQueryBatch = 100).count()
    }
    assert(ex.getMessage.contains("maxQueryBatch"))
    // at the cap boundary it still runs
    assert(ProductQuant.pqTopK(codes, cb, queries, 5, maxQueryBatch = 10)
      .count() > 0)
  }

  test("pq: registry q75 returns 5 ranked rows per query, scores in [-1,1]") {
    val out = graft.QueryRegistry.byName("q75_embedding_pq_topk")
      .run(spark, sf("sf0.001")).collect()
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.size == 3 && perQ.values.forall(_.length == 5))
    assert(out.forall { r => val c = r.getDouble(3); c >= -1.0 && c <= 1.0 })
    perQ.values.foreach { rows =>
      assert(rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq ==
             rows.map(_.getDouble(3)).toSeq.sorted.reverse)
    }
  }
}
