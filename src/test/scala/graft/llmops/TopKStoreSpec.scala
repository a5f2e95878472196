package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Misra–Gries store contract behind q212: the relational rank-(K+1)
  * reduction computes the textbook summary, counters never overcount and
  * undercount within N/(K+1), heavy hitters always survive, replayed
  * epochs are no-ops (MG addition is NOT idempotent — the store must
  * refuse duplicates itself), and the streaming twin lands the batch-API
  * state through at-least-once foreachBatch delivery.
  */
class TopKStoreSpec extends SparkTestBase {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("topkstore-spec-").toString

  private def counters(dir: String): Map[String, Long] =
    TopKStore.counters(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exactCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    TopKStore.termCounts(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("mgReduce: textbook rank-(K+1) subtraction on a hand fixture") {
    import spark.implicits._
    // counts 10,9,8,...,1 over 10 terms, k=3 → subtract the 4th value (7):
    // survivors t10→3, t09→2, t08→1.
    val counts = (1 to 10).map(i => (f"t$i%02d", i.toLong)).toDF("term", "c")
    val got = TopKStore.mgReduce(counts, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("t10" -> 3L, "t09" -> 2L, "t08" -> 1L), got.toString)
    // fewer than k+1 counters: no subtraction at all
    val small = Seq(("a", 5L), ("b", 2L)).toDF("term", "c")
    val got2 = TopKStore.mgReduce(small, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("a" -> 5L, "b" -> 2L))
  }

  test("warm store: no overcount, undercount within N/(K+1), heavy hitters covered") {
    val dir = tmp()
    TopKStore.build(docs.filter(col("doc_id") % 2 === 0), dir)
    TopKStore.update(spark, dir, docs.filter(col("doc_id") % 2 === 1), epoch = 0)
    val store = counters(dir)
    assert(store.nonEmpty && store.size <= TopKStore.K)
    val exact = exactCounts(docs)
    val n = exact.values.sum
    store.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounts: $c > ${exact(t)}")
      assert((exact(t) - c) * (TopKStore.K + 1) <= n,
        s"$t undercount ${exact(t) - c} breaks the N/(K+1) bound")
    }
    exact.filter { case (_, c) => c * (TopKStore.K + 1) > n }.keys.foreach { t =>
      assert(store.contains(t), s"heavy hitter $t missing from the store")
    }
  }

  test("epoch guard: a replayed epoch is a no-op; a fresh epoch lands") {
    val dir = tmp()
    TopKStore.build(docs.filter(col("doc_id") % 3 === 0), dir)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    TopKStore.update(spark, dir, batch, epoch = 1)
    val after1 = counters(dir)
    TopKStore.update(spark, dir, batch, epoch = 1) // replay: must not double-count
    assert(counters(dir) == after1, "replayed epoch mutated the store")
    TopKStore.update(spark, dir, docs.filter(col("doc_id") % 3 === 2), epoch = 2)
    assert(counters(dir) != after1, "fresh epoch should land")
  }

  test("streaming twin: micro-batches land the store within the MG bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    TopKStore.build(docs.filter(col("doc_id") % 2 === 0), dir)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TopKStore.stream(stream.toDS().toDF("doc_id", "text"), dir).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val store = counters(dir)
    val exact = exactCounts(docs)
    val n = exact.values.sum
    assert(store.nonEmpty && store.size <= TopKStore.K)
    store.foreach { case (t, c) =>
      assert(c <= exact(t) && (exact(t) - c) * (TopKStore.K + 1) <= n,
        s"$t: streamed counter $c vs exact ${exact(t)}")
    }
  }
}
