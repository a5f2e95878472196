package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Unit-level behavior of the llmops operators on controlled inputs
  * (the sf-data correctness is covered by the DuckDB oracle via Verify).
  */
class LlmOpsSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingle pipelines are total on docs shorter than k (empty/1-token)") {
    // regression: InferFiltersFromGenerate can evaluate size(spans)>0
    // below the length guard — short docs must yield empty spans, not
    // out-of-bounds element_at
    val d = docs((1L, ""), (2L, "a"), (3L, "one two"), (4L, "x y z w v u t s"))
    assert(Dedup.minhashSignatures(d, k = 3).count() == 1)
    assert(TextAnalysis.winnowFingerprints(d, window = 5).count() == 1)
    val pairs = Dedup.minhashPairs(Dedup.minhashSignatures(d, 3), minSim = 0.0)
    assert(pairs.count() == 0) // one doc → no pairs, no crash
  }

  test("minhash: identical docs get identical signatures and est 1.0") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different tokens nothing shared here at all folks today"))
    val sigs = Dedup.minhashSignatures(d, k = 3)
    val pairs = Dedup.minhashPairs(sigs, minSim = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("minhash: near-dup (one token changed) scores high but < exact") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok20", "changed")
    val d = docs((1L, base), (2L, nearDup))
    val pairs = Dedup.minhashPairs(Dedup.minhashSignatures(d, 3), minSim = 0.5).collect()
    assert(pairs.length == 1)
    val est = pairs.head.getDouble(2)
    assert(est > 0.5 && est < 1.0)
  }

  test("simhash: identical docs → hamming 0; disjoint docs not near") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"))
    val pairs = Dedup.simhashPairs(Dedup.simhash(d), maxHamming = 3).collect()
    assert(pairs.length == 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) == (1L, 2L))
    assert(pairs.head.getInt(2) == 0)
  }

  test("winnow fingerprints: shared spans between overlapping docs") {
    val shared = "copy this exact span of tokens right here please now"
    val d = docs((1L, s"prefix one two $shared suffix a"), (2L, s"other start words $shared end b"))
    val fp = TextAnalysis.winnowFingerprints(d, window = 5, w = 2)
    val byDoc = fp.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
  }

  test("winnowing guarantee: shared run >= window+w-1 tokens is caught at EVERY alignment") {
    // the case fixed-stride blocked minima miss: a shared span straddling
    // a block boundary. True winnowing has no boundaries — shift the span
    // through all alignments and the guarantee must hold for each.
    val w = 4
    val window = 5
    val shared = (1 to 30).map(i => s"s$i").mkString(" ") // 30 > window+w-1
    (0 to 7).foreach { shift =>
      val prefix = (1 to shift).map(i => s"p$i").mkString(" ")
      val d = docs(
        (1L, (s"$prefix $shared tail1 tail2").trim),
        (2L, s"q1 q2 q3 q4 q5 q6 q7 q8 q9 $shared r1 r2"))
      val fp = TextAnalysis.winnowFingerprints(d, window, w)
      val byDoc = fp.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
        s"alignment shift=$shift missed the shared span")
    }
  }

  test("winnow fingerprints: short docs keep one fingerprint, sub-k docs none") {
    val d = docs(
      (1L, "a b c d e"),        // exactly window tokens → 1 span, < w spans
      (2L, "a b c"),            // shorter than window → no spans
      (3L, "a b c d e f g"))    // 3 spans, still < w=4 → min of all, one fp
    val fp = TextAnalysis.winnowFingerprints(d, window = 5, w = 4)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .view.mapValues(_.length).toMap
    assert(byDoc.get(1L).contains(1))
    assert(!byDoc.contains(2L))
    assert(byDoc.get(3L).contains(1))
  }

  test("cosine/dot: exact values on known vectors") {
    import spark.implicits._
    val v = Seq((1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(v.filter(col("vec_id") === 1), v, k = 2).collect()
    assert(topk.length == 2)
    // cos(e1, e1+e2) = 1/sqrt(2) ≈ 0.7071; cos(e1, e2) = 0
    assert(topk(0).getLong(2) == 3L && math.abs(topk(0).getDouble(3) - 0.7071) < 1e-9)
    assert(topk(1).getLong(2) == 2L && topk(1).getDouble(3) == 0.0)
  }

  test("lsh buckets: identical vectors share a bucket; pairs found") {
    import spark.implicits._
    val e = Seq(
      (1L, (1 to 64).map(i => math.sin(i).toFloat)),
      (2L, (1 to 64).map(i => math.sin(i).toFloat)),
      (3L, (1 to 64).map(i => math.cos(i * 3).toFloat))).toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearDupPairs(e, minCos = 0.99, nBits = 8).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("q244: degenerate LSH (nBits=0) equals exact all-pairs cosine range") {
    // the universal invariant the driver oracles: one empty-signature
    // bucket makes the candidate join all-pairs, so the LSH pipeline's
    // output must match an INDEPENDENT all-pairs plan (theta join here vs
    // the bucket equi-join + Materialize inside lshNearDupPairs)
    val dir = sf("sf0.001")
    val got = Similarity.q244.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = graft.Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val exact = a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        graft.operators.Ops.ffloor(
          Similarity.cosine(col("e1"), col("e2")), 4).as("cos"))
      .filter(col("cos") >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty)
    assert(got == exact)
  }

  test("winnowing overlap: doc pair sharing a long span is found, disjoint doc is not") {
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ") // 60-token shared span
    val d = docs(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three four $shared five six"),
      (3L, "completely different words with no overlap at all whatsoever in any block"))
    val pairs = TextAnalysis.winnowingOverlapPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("kmeansCentroids: recovers two well-separated clusters, deterministic") {
    import spark.implicits._
    // two tight clusters around +e1 and +e2 (20 vectors each, dim 4)
    val pts = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.zipWithIndex.map { case (x, j) => x + ((i * 7 + j) % 5) * 0.01f }.toSeq)
    }.toDF("vec_id", "embedding")
    val c1 = Similarity.kmeansCentroids(pts, k = 2, iters = 4)
    val c2 = Similarity.kmeansCentroids(pts, k = 2, iters = 4)
    assert(c1 == c2) // deterministic: seeded init, fixed iterations
    // one centroid near each cluster mean (dominant axis ≈ 10)
    val axes = c1.map(_._2.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes == Set(0, 1), s"centroids collapsed onto one cluster: $c1")
    c1.foreach { case (_, v) => assert(math.abs(v.max - 10.0) < 0.1) }
  }

  test("IVF index persistence: saved+loaded index answers queries identically to train-inline") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    Similarity.saveIndex(e, dir, k = 8, iters = 3)
    val (centroids, assigned) = Similarity.loadIndex(spark, dir)

    // rebuild bit-matches the persisted centroids (content-addressed train)
    assert(centroids == Similarity.kmeansCentroids(e, k = 8, iters = 3))

    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id").isin(100L, 101L, 102L))
    val fromIndex = Similarity.ivfQuery(centroids, assigned, queries, nprobe = 3, topK = 5)
      .collect().toSeq
    val inline = graft.QueryRegistry.byName("q38_embedding_ivf_topk")
      .run(spark, sf("sf0.001")).collect().toSeq
    assert(fromIndex == inline)
  }

  test("IVF pruning quality: 3-probe recall@10 on the fixture, full-probe exact") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val queries = e.filter(col("vec_id").isin(100L, 101L, 102L))
    val exact = Similarity.bruteForceTopK(queries, e, k = 10)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val centroids = Similarity.kmeansCentroids(e, k = 8, iters = 3)
    val assigned = Similarity.ivfAssign(e, centroids)
    def recalls(nprobe: Int): Iterable[Double] = {
      val got = Similarity.ivfQuery(centroids, assigned, queries, nprobe, topK = 10)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      exact.map { case (q, ex) =>
        ex.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ex.size }
    }
    // full probe degenerates to exact search — the q195 driver invariant
    assert(recalls(nprobe = 8).forall(_ == 1.0))
    // 3-probe on this near-uniform corpus is chance-level (~nprobe/k);
    // the floor documents the measured fixture value (min 0.3, avg 0.6),
    // not a production claim — see q195's scaladoc.
    val r3 = recalls(nprobe = 3)
    assert(r3.min >= 0.3, s"3-probe fixture recall regressed: $r3")
    assert(r3.sum / r3.size >= 0.5, s"3-probe fixture avg recall regressed: $r3")
  }

  test("multimodal: stub decode is deterministic, schema intact, frames sample") {
    import spark.implicits._
    val d = Seq((0L, "video payload text", "en", "src0", 18L),
                (2L, "another clip", "en", "src2", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.fromDocuments(d)
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq,
        r.get(3).toString, r.getInt(4), r.getInt(5), r.getLong(6))).toList
    val dec1 = Multimodal.decodeStub(media).collect().sortBy(_.getLong(0))
    val dec2 = Multimodal.decodeStub(media).collect().sortBy(_.getLong(0))
    assert(canon(dec1) == canon(dec2))
    assert(dec1.head.schema.fieldNames.contains("width"))
    val frames = Multimodal.sampleFrames(Multimodal.decodeStub(media), everyMs = 100000)
    // doc 0 → modality image (0%3==0); doc 2 → video; only video sampled
    assert(frames.select("media_id").distinct().collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("observe(): data-quality counters ride the corpus pipeline for free") {
    import org.apache.spark.sql.Observation
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog here today twenty one two three four five six seven eight nine ten"),
      (2L, "a b"),
      (3L, "the quick brown fox jumps over the lazy dog here today twenty one two three four five six seven eight nine ten"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val obs = Observation("corpus-quality")
    val pipeline = CorpusPipeline.normalize(d)
      .observe(obs,
        count(lit(1)).as("docs_in"),
        count(when(length(col("text_norm")) < 10, 1)).as("too_short"))
    val out = CorpusPipeline.dedupExact(pipeline).count()
    assert(out == 2) // docs 1 and 3 are exact dups post-normalization
    val m = obs.get
    assert(m("docs_in") == 3L && m("too_short") == 1L)
  }

  test("degenerate audit configs are gated behind auditOnly (round-9 item 3)") {
    // The q244/q245/q247 exactness audits deliberately use quadratic
    // all-pairs configurations (nBits = 0 one-bucket LSH, w = 1
    // non-winnowing); a production caller reaching them by accident on a
    // lake-scale table must fail fast, not run O(n²).
    val d = docs((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i k"))
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0f, 0.0f), "a"), (2L, Array(0.9f, 0.1f), "a"))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairs(vecs, minCos = 0.2, nBits = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.winnowingOverlapPairs(d, window = 5, w = 1)
    }
    intercept[IllegalArgumentException] {
      CurationOps.semanticDedupReport(vecs, minCos = 0.2, nBits = 0)
    }
    // the opted-in audit path still runs
    assert(TextAnalysis.winnowingOverlapPairs(d, window = 5, w = 1,
      minShared = 1, auditOnly = true).count() >= 0)
  }

  test("langIdScore picks the profile with most hits") {
    val d = docs((1L, "der hund und die katze"), (2L, "the cat and the dog"))
    val out = TextAnalysis.langIdScore(d,
      Map("en" -> Seq(" the ", " and "), "de" -> Seq(" und ", " die ")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "de" && out(2L) == "en")
  }
}
