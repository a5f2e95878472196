package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the round-7 second-wave additions on closed-form
  * fixtures: q203 MI (determined axes → ln 2, independent axes → 0),
  * q204 chi² (perfect discriminator → N, balanced term → 0), q205
  * session paths (crafted sessions → exact path strings), q206
  * water-filling (hand-solved allocation incl. the +1 remainder), q207
  * padding waste (closed-form pad counts), q208 greedy set cover
  * (planted coverage order + duplicate-doc starvation + exhaustion).
  * The DuckDB hash oracle proves engine parity on sf data; these prove
  * the SEMANTICS.
  */
class Round7OpsSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("round7ops").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("round7ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  private def row(id: Long, text: String) =
    (id, text, "en", "src0", text.length.toLong)

  test("q203: source-determines-lang corpus scores MI = ln 2; independent grid scores 0") {
    // Determined: src0 → en only, src1 → de only, equal mass.
    val det = (0 until 4).map(i => (i.toLong, "x", "en", "src0", 1L)) ++
      (4 until 8).map(i => (i.toLong, "x", "de", "src1", 1L))
    val got = FeatureStats.q203.run(spark, docsDir(det)).collect()
    assert(got.length == 2)
    // pmi of each occupied cell = ln((4·8)/(4·4)) = ln 2
    assert(got.forall(_.getLong(3) == 693147L), got.mkString(","))
    assert(got.forall(_.getDouble(4) == 0.693147), got.mkString(","))

    // Independent: uniform 2×2 grid → every pmi = ln 1 = 0, MI = 0.
    val ind = Seq(
      (0L, "x", "en", "src0", 1L), (1L, "x", "de", "src0", 1L),
      (2L, "x", "en", "src1", 1L), (3L, "x", "de", "src1", 1L))
    val got2 = FeatureStats.q203.run(spark, docsDir(ind)).collect()
    assert(got2.length == 4)
    assert(got2.forall(_.getLong(3) == 0L))
    assert(got2.forall(_.getDouble(4) == 0.0))
  }

  test("q204: perfect discriminator scores chi2 = N, balanced term scores 0, all-doc term excluded") {
    // 4 en docs carry "alpha", 4 de docs don't; "beta" is balanced 2/2;
    // "common" appears in every doc → excluded (zero-information).
    val docs =
      (0 until 4).map(i =>
        (i.toLong, s"alpha common u$i" + (if (i < 2) " beta" else ""), "en", "s", 1L)) ++
      (4 until 8).map(i =>
        (i.toLong, s"common v$i" + (if (i < 6) " beta" else ""), "de", "s", 1L))
    val got = FeatureStats.q204.run(spark, docsDir(docs)).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("alpha") == 8.0, s"perfect split is chi2=N: $got")
    assert(got("beta") == 0.0, s"balanced term is chi2=0: $got")
    assert(!got.contains("common"), "a term in every doc has zero denominator")
  }

  test("q205: crafted sessions produce exact ordered paths with counts") {
    val h = 3600L * 1000
    val ev = Seq(
      // user 1, session 1: view > click > purchase
      (1L, ts(0), 1L, "view"), (2L, ts(1000), 1L, "click"),
      (3L, ts(2000), 1L, "purchase"),
      // user 1, session 2 (5h later): view > view
      (4L, ts(5 * h), 1L, "view"), (5L, ts(5 * h + 500), 1L, "view"),
      // user 2, one session repeating the funnel path
      (6L, ts(0), 2L, "view"), (7L, ts(100), 2L, "click"),
      (8L, ts(200), 2L, "purchase"))
    val got = FeatureStats.q205.run(spark, eventsDir(ev)).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("view>click>purchase", 2L), ("view>view", 1L)), got.mkString(","))
  }

  test("q206: hand-solved water level, caps, and +1 largest-remainder distribution") {
    // tokens a=11, b=30, c=100, d=100 → caps 22/60/200/200, N=241,
    // B=floor(1.9·241)=457. Sorted caps: a,b,c,d; k*=2 (a,b capped);
    // λ=(457−82)/2=187 rem 1 → c gets 188, d gets 187. Σalloc = B.
    def text(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, text(11), "en", "a", 1L), (2L, text(30), "en", "b", 1L),
      (3L, text(100), "en", "c", 1L), (4L, text(100), "en", "d", 1L))
    val got = SelectionOps.q206.run(spark, docsDir(docs)).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    assert(got("a") == ((true, 22L)), got.toString)
    assert(got("b") == ((true, 60L)), got.toString)
    assert(got("c") == ((false, 188L)), "first uncapped source takes the +1 remainder")
    assert(got("d") == ((false, 187L)), got.toString)
    assert(got.values.map(_._2).sum == 457L, "allocations must sum to exactly B")
  }

  test("q206: allocations sum to exactly the budget on real data") {
    val rows = SelectionOps.q206.run(spark, sf("sf0.001")).collect()
    val total = rows.map(_.getLong(4)).sum
    val n = rows.map(_.getLong(1)).sum
    assert(total == n * 19L / 10L, s"sum(alloc)=$total != floor(1.9·$n)")
  }

  test("q207: closed-form padding on fixed lengths") {
    def text(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, text(10), "en", "s", 1L), (2L, text(64), "en", "s", 1L),
      (3L, text(65), "en", "s", 1L), (4L, text(600), "en", "s", 1L))
    val got = SelectionOps.q207.run(spark, docsDir(docs)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(64L) == ((2L, 74L, 950L, 54L)), got.toString)    // 10 & 64 tokens
    assert(got(128L) == ((1L, 65L, 447L, 63L)), got.toString)   // 65 tokens
    assert(got(512L) == ((1L, 512L, 0L, 0L)), "600 truncates to 512: no padding")
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("round7emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q209: mutual pair found, one-directional NN excluded, zero-norm excluded") {
    // v1=(1,0) and v2≈v1 are each other's NN → mutual. v3=(0,1): its NN
    // is v2, but v2's NN is v1 → one-directional, excluded. v4 = zero
    // vector → no direction, excluded outright.
    val dir = embDir(Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0.1f), 0),
      (3L, Array(0f, 1f), 0), (4L, Array(0f, 0f), 0)))
    val got = RetrievalOps.q209.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0, 1L, 2L)), got.mkString(","))
  }

  test("q216: monoculture source fails both gates; uniform source passes with entropy ln|langs|") {
    // src "mono": 6 docs, one lang → l=1, entropy 0 → both gates false.
    // src "divers": 2 docs each of 4 langs → l=4, entropy = ln 4 ≈ 1.386294.
    val docs =
      (0 until 6).map(i => (i.toLong, "x", "en", "mono", 1L)) ++
      Seq("en", "de", "es", "fr").zipWithIndex.flatMap { case (l, i) =>
        Seq((10L + 2 * i, "x", l, "divers", 1L), (11L + 2 * i, "x", l, "divers", 1L)) }
    val got = PrivacyOps.q216.run(spark, docsDir(docs)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got("mono") == ((1L, 0.0, false, false)), got.toString)
    assert(got("divers")._1 == 4L && got("divers")._3 && got("divers")._4, got.toString)
    assert(got("divers")._2 == 1.386294, s"uniform-4 entropy is ln 4: $got")
  }

  test("q215: the planted cross-label vector is the top centroid outlier") {
    // label 0 points along +x, label 1 along +y; vector 9 carries label 0
    // but points along +y → lowest cosine to label 0's centroid.
    val aligned0 = (1 to 4).map(i => (i.toLong, Array(1f, 0.1f * i), 0))
    val aligned1 = (5 to 8).map(i => (i.toLong, Array(0.1f * i, 1f), 1))
    val planted = Seq((9L, Array(0.01f, 1f), 0))
    val dir = embDir(aligned0 ++ aligned1 ++ planted)
    val got = RetrievalOps.q215.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.head._2 == 9L, s"planted mislabel should rank first: ${got.mkString(",")}")
    assert(got.head._3 < got.last._3, "output must ascend in cosine")
  }

  test("q210: pivot is the modal token; contexts clip at document edges") {
    val docs = Seq(
      (1L, "p q r x s t u", "en", "s", 1L),
      (2L, "x x", "en", "s", 1L))   // boosts x to modal frequency
    val got = RetrievalOps.q210.run(spark, docsDir(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, "p q r", "s t u"),
      (2L, 0L, "", "x"),
      (2L, 1L, "x", "")), got.mkString(","))
  }

  test("q211: identical rankings score RBO = 1 - p^10; no matches scores 0") {
    // Single query term, equal doc lengths → both BM25 and TF-IDF rank
    // by tf desc (doc_id tiebreak): rankings coincide, X_d = d, and
    // RBO = Σ(1-p)p^(d-1) = 1 - 0.9^10 (floored weight table: 0.651321).
    def doc(id: Long, k: Int) =
      (id, (("spark " * k) + (1 to (20 - k)).map(i => s"f${id}x$i").mkString(" ")).trim,
        "en", "s", 1L)
    val docs = (1 to 12).map(i => doc(i.toLong, i))
    val got = RetrievalOps.q211.run(spark, docsDir(docs)).collect()
    assert(got.forall(r => r.getLong(1) == r.getLong(0)), // X_d = d
      got.map(r => (r.getLong(0), r.getLong(1))).mkString(","))
    assert(got.forall(_.getDouble(3) == 0.651321), got.mkString(","))

    // A corpus with no query-term hits: every overlap 0, RBO 0.
    val none = Seq((1L, "a b c", "en", "s", 1L), (2L, "d e f", "en", "s", 1L))
    val got2 = RetrievalOps.q211.run(spark, docsDir(none)).collect()
    assert(got2.forall(r => r.getLong(1) == 0L && r.getDouble(3) == 0.0))
  }

  test("q213: profile counts nulls, distincts, and renders min/max portably") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("round7ord").toString
    Seq(
      (1L, Option(10L), "O", Option(10.5), new java.sql.Timestamp(1700000000000L), "1-URGENT"),
      (2L, Option(20L), "F", None, new java.sql.Timestamp(1700000100000L), "1-URGENT"),
      (3L, None, "O", Option(30.25), new java.sql.Timestamp(1700000200000L), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Warehouse.q213.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("o_custkey") == ((3L, 1L, 2L, "10", "20")), got.toString)
    assert(got("o_totalprice") == ((3L, 1L, 2L, "10.5", "30.25")), got.toString)
    assert(got("o_orderstatus") == ((3L, 0L, 2L, "F", "O")), got.toString)
    assert(got("o_orderdate")._4 == "1700000000000000", "timestamps render as epoch-micros")
  }

  test("q214: slope 0 for flat frequencies, negative with high R2 for decay, NULL for 1 term") {
    // every term equally frequent → y constant → numerator 0 → slope 0.0,
    // R2 undefined (zero y-variance) → NULL
    val flat = docsDir(Seq(row(1L, "a b c a b c")))
    val s1 = TextAnalysis.q214.run(spark, flat).collect()(0)
    assert(s1.getDouble(1) == 0.0 && s1.isNullAt(2), s1.toString)

    // exact power law c = 16/rank (16,8,4,2 over ranks 1,2,4,... not exact
    // ranks — but ln-ln is perfectly linear for c = 2^(4-k), rank 2^k only
    // approximately; assert slope < 0 and R2 > 0.9 instead of exactness)
    val decay = docsDir(Seq(row(1L, ("w1 " * 16 + "w2 " * 8 + "w3 " * 4 + "w4 " * 2).trim)))
    val s2 = TextAnalysis.q214.run(spark, decay).collect()(0)
    assert(s2.getDouble(1) < 0.0 && s2.getDouble(2) > 0.9, s2.toString)

    // a single term: rank domain is one point → both denominators 0 → NULL
    val one = docsDir(Seq(row(1L, "solo solo solo")))
    val s3 = TextAnalysis.q214.run(spark, one).collect()(0)
    assert(s3.isNullAt(1) && s3.isNullAt(2), s3.toString)
  }

  test("q208: greedy picks by uncovered-trigram gain, ties break low-id, exhaustion stops") {
    def text(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val a = text("a", 12)                  // 10 trigrams
    val b = text("b", 8)                   // 6 trigrams
    val docs = Seq(
      (1L, a, "en", "s", 1L), (2L, b, "en", "s", 1L),
      (3L, a, "en", "s", 1L),              // duplicate of 1 → starved to 0
      (4L, text("a", 6), "en", "s", 1L))   // prefix of a → fully covered
    val got = SelectionOps.q208.run(spark, docsDir(docs)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L, 10L), (2, 2L, 6L)),
      s"expected A then B then exhaustion: ${got.mkString(",")}")
  }
}
