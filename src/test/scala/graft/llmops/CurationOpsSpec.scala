package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 curation operators on controlled
  * corpora (the hash-oracle proves engine parity for q91–q94; these prove
  * the operators measure what they claim, and carry q95's correctness
  * entirely — seeded hyperplanes have no SQL oracle).
  */
class CurationOpsSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def vecsDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation_vec").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q91: bloom pre-filter + exact verify equals the exact q58 decontamination") {
    val sfDir = sf("sf0.01")
    val bloom = CurationOps.q91.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = CorpusPipeline.q58.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bloom.sameElements(exact),
      s"bloom path diverged: ${bloom.toSeq} vs ${exact.toSeq}")
    assert(exact.nonEmpty) // the check has power: contamination exists at sf0.01
  }

  test("q91: planted 8-gram contamination is found with exact counts") {
    val evalText = (1 to 20).map(i => s"ev$i").mkString(" ")
    // doc 30 contains eval tokens 5..12 (one 8-gram window = positions 5..12
    // give exactly 1 shared 8-gram); doc 31 is clean.
    val contaminated = ((1 to 4).map(i => s"x$i") ++ (5 to 12).map(i => s"ev$i") ++
      (1 to 4).map(i => s"y$i")).mkString(" ")
    val clean = (1 to 16).map(i => s"z$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, evalText, "en", "s", 1L),
      (30L, contaminated, "en", "s", 1L),
      (31L, clean, "en", "s", 1L)))
    val out = CurationOps.q91.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((30L, 1L)))
  }

  test("q92: acceptance probability clamps to [0.05, 1] and keep-all at p=1") {
    // 600-char docs have p=1 (>= 400): ALL must be sampled regardless of hash.
    val dir = docsDir((1L to 40L).map(i =>
      (i, s"doc$i", "en", if (i <= 20) "big" else "small",
        if (i <= 20) 600L else 8L)))
    val out = CurationOps.q92.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("big") == ((20L, 20L)), s"p=1 stratum must keep everything: $out")
    // tiny docs: p clamps at 0.05 — expect FEW kept (binomial n=20 p=0.05;
    // 20 would mean the clamp failed)
    assert(out("small")._2 < 10L, s"p=0.05 stratum kept too many: $out")
  }

  test("q93: repetitive text scores below novel text; add-one smoothing exact on a closed form") {
    val rep = Array.fill(9)("ab ab").mkString(" ") // "ab ab ab ..." 18 tokens
    val novel = (1 to 18).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, rep, "en", "s", 1L),
      (2L, novel, "en", "s", 1L)))
    val out = CurationOps.q93.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 17L && out(2L)._1 == 17L)
    assert(out(1L)._2 < out(2L)._2,
      s"repetition must lower cross-entropy: $out")
    // closed form for the repetitive doc: vocab V=19 (ab + w1..w18);
    // bigram (ab,ab) has c12=17, head count c1=17 → s = ln((17+19)/(17+1))
    val expected = math.log((17.0 + 19.0) / 18.0)
    assert(math.abs(out(1L)._2 - expected) < 1e-3, s"got ${out(1L)._2}, want $expected")
  }

  test("q94: each rule fires on its designed violator and only kept docs pass all") {
    val good = (1 to 30).map(i => "word" + (i % 7)).mkString(" ") + " the a the"
    val short = "tiny doc the a"
    val long = (1 to 95).map(i => "word" + (i % 7)).mkString(" ") + " the a"
    val longWords = (1 to 30).map(_ => "extraordinarily").mkString(" ") + " the a"
    val noStop = (1 to 30).map(i => "word" + (i % 7)).mkString(" ")
    val dir = docsDir(Seq(
      (1L, good, "en", "sG", 1L),
      (2L, short, "en", "sS", 1L),
      (3L, long, "en", "sL", 1L),
      (4L, longWords, "en", "sW", 1L),
      (5L, noStop, "en", "sN", 1L)))
    val out = CurationOps.q94.run(spark, dir).collect().map(r =>
      r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // (n_kept, n_short, n_long, n_wordlen, n_stop)
    assert(out("sG")._1 == 1L, s"good doc must pass: $out")
    assert(out("sS")._2 == 1L && out("sS")._1 == 0L)
    assert(out("sL")._3 == 1L && out("sL")._1 == 0L)
    assert(out("sW")._4 == 1L && out("sW")._1 == 0L)
    assert(out("sN")._5 == 1L && out("sN")._1 == 0L)
  }

  test("DecontamStore: persisted bloom+grams filter batches; clean docs pass, contaminated drop") {
    val evalText = (1 to 20).map(i => s"ev$i").mkString(" ")
    val dirtyText = ((1 to 4).map(i => s"x$i") ++ (5 to 12).map(i => s"ev$i") ++
      (1 to 4).map(i => s"y$i")).mkString(" ")
    val cleanText = (1 to 16).map(i => s"z$i").mkString(" ")
    val evalDir = docsDir(Seq((1L, evalText, "en", "s", 1L)))
    val store = java.nio.file.Files.createTempDirectory("decontam").toString
    CurationOps.DecontamStore.build(
      spark.read.parquet(s"$evalDir/documents.parquet"), store)
    import spark.implicits._
    val batch = Seq((30L, dirtyText), (31L, cleanText)).toDF("doc_id", "text")
    val out = CurationOps.DecontamStore
      .decontaminateBatch(spark, store, batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(31L), s"dirty doc must drop, clean must pass: ${out.toSeq}")
  }

  test("DecontamStore: streaming ingest filters per micro-batch via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evalDir = docsDir(Seq((1L, (1 to 20).map(i => s"ev$i").mkString(" "), "en", "s", 1L)))
    val store = java.nio.file.Files.createTempDirectory("decontam_s").toString
    CurationOps.DecontamStore.build(
      spark.read.parquet(s"$evalDir/documents.parquet"), store)
    val dirty = ((1 to 4).map(i => s"x$i") ++ (5 to 12).map(i => s"ev$i")).mkString(" ")
    val clean = (1 to 16).map(i => s"z$i").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    stream.addData((40L, dirty), (41L, clean))
    val landed = scala.collection.mutable.ArrayBuffer[Long]()
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        CurationOps.DecontamStore.decontaminateBatch(spark, store, batch)
          .select("doc_id").collect().foreach(r => landed.synchronized {
            landed += r.getLong(0)
          })
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(landed.sorted.toSeq == Seq(41L),
      s"stream must land only the clean doc: ${landed.toSeq}")
  }

  test("q109: planted contaminated span is excised; surrounding text survives byte-exactly") {
    val evalText = (1 to 20).map(i => s"ev$i").mkString(" ")
    // doc 30: 4 clean + 8 eval tokens (one exact 8-gram) + 4 clean;
    // doc 31 fully clean → must NOT be emitted
    val pre = (1 to 4).map(i => s"x$i")
    val post = (1 to 4).map(i => s"y$i")
    val contaminated = (pre ++ (5 to 12).map(i => s"ev$i") ++ post).mkString(" ")
    val dir = docsDir(Seq(
      (1L, evalText, "en", "s", 1L),
      (30L, contaminated, "en", "s", 1L),
      (31L, (1 to 16).map(i => s"z$i").mkString(" "), "en", "s", 1L)))
    val out = CurationOps.q109.run(spark, dir).collect()
    assert(out.length == 1, s"only the contaminated doc is emitted: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 30L && r.getLong(1) == 16L && r.getLong(2) == 8L)
    val expected = (pre ++ post).mkString(" ")
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(3) == expectedMd5,
      s"rebuilt text must be exactly the clean remainder: $r")
  }

  test("NBModelStore: persisted model scores batches identically to inline q103") {
    val sfDir = sf("sf0.01")
    val store = java.nio.file.Files.createTempDirectory("nbstore").toString
    CurationOps.NBModelStore.build(
      spark.read.parquet(s"$sfDir/documents.parquet"), store)
    val stored = CurationOps.NBModelStore
      .scoreBatch(spark, store, spark.read.parquet(s"$sfDir/documents.parquet"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val inline = CurationOps.q103.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(stored.sameElements(inline),
      s"store scoring diverged from inline (first 3): ${stored.take(3).toSeq} vs ${inline.take(3).toSeq}")
  }

  test("NBModelStore: OOV tokens score the stored prior default") {
    // unbalanced seeds → nonzero prior: neg seed has 9 tokens, pos 3
    val dir = docsDir(Seq(
      (1L, "good clean text", "en", "src0", 1L),
      (2L, "spam junk spam junk spam junk spam junk spam", "en", "src1", 1L)))
    val store = java.nio.file.Files.createTempDirectory("nbstore_oov").toString
    CurationOps.NBModelStore.build(
      spark.read.parquet(s"$dir/documents.parquet"), store)
    val meta = spark.read.parquet(s"$store/meta.parquet").head
    val expected = math.floor(
      meta.getLong(meta.fieldIndex("default_llr_micro")).toDouble / 1e6 * 1e4) / 1e4
    import spark.implicits._
    val out = CurationOps.NBModelStore.scoreBatch(spark, store,
        Seq((99L, "wholly unseen tokens entirely")).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 4L)
    assert(out.head.getDouble(2) == expected,
      s"OOV doc must score the prior default: ${out.head} vs $expected")
    assert(expected > 0, "fixture: bigger neg seed → unseen tokens lean positive prior")
  }

  test("NBModelStore: streaming micro-batches score via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = docsDir(Seq(
      (1L, "good clean prose text here", "en", "src0", 1L),
      (2L, "spam spam junk junk junk", "en", "src1", 1L)))
    val store = java.nio.file.Files.createTempDirectory("nbstore_s").toString
    CurationOps.NBModelStore.build(
      spark.read.parquet(s"$dir/documents.parquet"), store)
    val stream = MemoryStream[(Long, String)]
    stream.addData((50L, "good clean prose"), (51L, "junk spam junk"))
    val scored = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        CurationOps.NBModelStore.scoreBatch(spark, store, batch)
          .collect().foreach(r => scored.synchronized {
            scored += ((r.getLong(0), r.getDouble(2)))
          })
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val byId = scored.toMap
    assert(byId.keySet == Set(50L, 51L), s"both docs must score: $scored")
    assert(byId(50L) > 0 && byId(51L) < 0,
      s"good-seed lookalike positive, junk negative: $scored")
  }

  test("DriftStore: same-shaped stream batches score near zero; shifted ones alarm") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // baseline: lengths spread over buckets 0..4
    val base = (1L to 100L).map(i => (i, "t", "en", "s", (i % 5) * 100 + 50))
    val dir = docsDir(base)
    val store = java.nio.file.Files.createTempDirectory("drift").toString
    CurationOps.DriftStore.build(
      spark.read.parquet(s"$dir/documents.parquet"), store)
    // stream two micro-batch payloads: one same-shaped, one all-bucket-9
    val stream = MemoryStream[(Long, Long)]
    stream.addData((1L to 100L).map(i => (i, (i % 5) * 100 + 50)): _*)
    val psis = scala.collection.mutable.ArrayBuffer[Long]()
    val q = stream.toDF().toDF("doc_id", "n_chars").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val total = CurationOps.DriftStore.psiOfBatch(spark, store, batch)
          .agg(sum("psi_micro")).head.getLong(0)
        psis.synchronized { psis += total }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(psis.nonEmpty && psis.head < 10000,
      s"identically-distributed batch must score ~0 PSI: $psis")
    val shifted = Seq((999L, "t", "en", "s", 950L), (998L, "t", "en", "s", 970L),
      (997L, "t", "en", "s", 990L))
    val shiftDir = docsDir(shifted)
    val alarm = CurationOps.DriftStore.psiOfBatch(spark, store,
        spark.read.parquet(s"$shiftDir/documents.parquet"))
      .agg(sum("psi_micro")).head.getLong(0)
    assert(alarm > 200000, s"bucket-9-only batch must exceed the 0.2 threshold: $alarm")
  }

  test("q96: hard negatives come only from other labels, ranked by cosine, self excluded") {
    val out = CurationOps.q96.run(spark, sf("sf0.01")).collect()
    assert(out.nonEmpty)
    val vecs = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (qid, rn, vid, cos) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(vecs(qid) != vecs(vid), s"negative $vid shares label with query $qid")
      assert(rn >= 1 && rn <= 5 && cos <= 1.0001 && cos >= -1.0001)
    }
    // per query: descending cosine
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q98: planted boilerplate spans strip; unique content survives byte-exactly") {
    // "sub to our feed" (4 tokens = two overlapping trigrams) appears in 6
    // docs -> df >= 5 -> every token it covers strips; unique tails survive.
    val boiler = "sub to our feed"
    val rows = (1L to 6L).map(i =>
      (i, s"$boiler unique$i tail$i words$i here$i", "en", "s", 1L)) :+
      (7L, "entirely original text with no repeats at all", "en", "s", 1L)
    val dir = docsDir(rows)
    val out = CurationOps.q98.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    (1L to 6L).foreach { i =>
      assert(out(i)._1 == 8L && out(i)._2 == 4L, s"doc $i: ${out(i)}")
      // the cleaned text is exactly the unique tail
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(s"unique$i tail$i words$i here$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(out(i)._3 == expect, s"doc $i md5 mismatch")
    }
    assert(out(7L)._1 == 8L && out(7L)._2 == 8L, s"doc 7 untouched: ${out(7L)}")
  }

  test("q99: epoch permutations decorrelate; shards stay balanced; totals conserved") {
    val dir = docsDir((1L to 400L).map(i => (i, s"doc$i", "en", "s", 10L)))
    val out = CurationOps.q99.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // every (epoch, shard) cell exists and totals conserve per epoch
    (0 to 1).foreach { e =>
      val counts = (0 to 7).map(sh => out.getOrElse((e, sh), 0L))
      assert(counts.sum == 400L, s"epoch $e loses docs: $counts")
      // binomial(400, 1/8): mean 50; all shards within a wide sanity band
      assert(counts.forall(c => c > 20 && c < 90), s"epoch $e skew: $counts")
    }
    // the two epochs are DIFFERENT permutations: per-shard counts can
    // collide, so check assignment-level divergence via the underlying hash
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def shard(e: Int) = (conv(substring(
      CorpusPipeline.hashFrac(col("doc_id"), s"epoch$e"), 8, 1), 16, 10)
      .cast("int") % 8).as(s"s$e")
    val moved = docs.select(shard(0), shard(1))
      .filter(col("s0") =!= col("s1")).count()
    assert(moved > 250, s"epochs barely decorrelate: only $moved of 400 moved")
  }

  test("q100: contamination attributes to the right suite with per-suite counts") {
    // eval docs 0..4 -> suites 0..4; corpus doc 20 copies an 8-gram from
    // eval doc 2 (suite 2) and one from eval doc 4 (suite 4)
    def run(tag: Int) = (1 to 20).map(i => s"e${tag}w$i").mkString(" ")
    val dirty = ((5 to 12).map(i => s"e2w$i") ++ (9 to 16).map(i => s"e4w$i")).mkString(" ")
    val rows = (0L to 4L).map(i => (i, run(i.toInt), "en", "s", 1L)) :+
      (20L, dirty, "en", "s", 1L)
    val dir = docsDir(rows)
    val out = CurationOps.q100.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // doc 20: exactly one shared 8-gram with suite 2 and one with suite 4
    assert(out == Map((20L, 2) -> 1L, (20L, 4) -> 1L), s"got $out")
  }

  test("q95: exact clones collapse to one survivor per clique, lowest id wins; distinct vectors survive") {
    val r = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // 5 distinct base vectors; base 0 cloned 3x (ids 100,101,102), base 1
    // cloned 2x (ids 200,201); others singletons. Clones are identical →
    // same LSH bucket, cosine 1.0 → all but the lowest id drop.
    val b = Seq.fill(5)(unit())
    // near-orthogonal random unit vectors in R^64 typically have |cos| < 0.2:
    // keep only bases that are pairwise below the threshold so singletons
    // can't accidentally pair (deterministic seed makes this stable).
    val rows = Seq(
      (100L, b(0), 0), (101L, b(0), 0), (102L, b(0), 0),
      (200L, b(1), 1), (201L, b(1), 1),
      (300L, b(2), 2), (400L, b(3), 3), (500L, b(4), 4))
    val dir = vecsDir(rows)
    val out = CurationOps.q95.run(spark, dir).collect()
      .map(r2 => r2.getInt(0) -> ((r2.getLong(1), r2.getLong(2)))).toMap
    assert(out(0) == ((3L, 1L)), s"clique of 3 keeps exactly 1: $out")
    assert(out(1) == ((2L, 1L)), s"clique of 2 keeps exactly 1: $out")
    assert(out(2) == ((1L, 1L)) && out(3) == ((1L, 1L)) && out(4) == ((1L, 1L)))
    // determinism: second run bit-identical
    val again = CurationOps.q95.run(spark, dir).collect()
      .map(r2 => r2.getInt(0) -> ((r2.getLong(1), r2.getLong(2)))).toMap
    assert(again == out)
    // lowest id is the survivor: the drop set is exactly the higher ids
    val pairs = Similarity.lshNearDupPairs(
      spark.read.parquet(s"$dir/embeddings.parquet"), minCos = 0.2, nBits = 8)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1)))
    assert(pairs.forall { case (v1, v2) => v1 < v2 })
  }

  test("q245: degenerate semantic dedup matches the brute-force drop rule") {
    val r = new scala.util.Random(11)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // clique of 3 clones (label 0), clique of 2 (label 1), singletons —
    // the q95 fixture shape, but verified against a brute-force replay of
    // the drop rule computed here with plain Scala, no Spark machinery
    val b = Seq.fill(5)(unit())
    val rows = Seq(
      (100L, b(0), 0), (101L, b(0), 0), (102L, b(0), 0),
      (200L, b(1), 1), (201L, b(1), 1),
      (300L, b(2), 2), (400L, b(3), 3), (500L, b(4), 4))
    val dir = vecsDir(rows)
    val out = CurationOps.q245.run(spark, dir).collect()
      .map(r2 => r2.getInt(0) -> ((r2.getLong(1), r2.getLong(2)))).toMap
    // brute-force: drop v iff some lower-id u has floor4(cos(u,v)) >= 0.2
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d, nx, ny = 0.0
      var i = 0
      while (i < 64) { d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i); i += 1 }
      math.floor(d / (math.sqrt(nx) * math.sqrt(ny)) * 1e4) / 1e4
    }
    val dropped = rows.map(_._1).filter(v => rows.exists { case (u, eu, _) =>
      u < v && cos(eu, rows.find(_._1 == v).get._2) >= 0.2
    }).toSet
    val expected = rows.groupBy(_._3).flatMap { case (label, g) =>
      val kept = g.count(t => !dropped(t._1))
      if (kept > 0) Some(label -> ((g.size.toLong, kept.toLong))) else None
    }
    assert(out == expected)
    // the globally lowest id can never be dropped
    assert(!dropped(rows.map(_._1).min))
  }
}
