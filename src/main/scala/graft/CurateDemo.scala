package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llmops.{CorpusPipeline, Dedup, TextAnalysis}

/** End-to-end corpus-curation demo: the full pass a pretraining data team
  * runs, composed entirely from the library's operators — evidence the
  * inventory interoperates as ONE pipeline, not 70 isolated queries.
  *
  *   1. normalize + exact-dedup (content fingerprint, lowest id wins)
  *   2. near-dup CLUSTER collapse: q101's fixpoint connected components
  *      over capped shared-5-gram edges, keep the min-id representative
  *      of every cluster
  *   3. PII redaction (chained global regex)
  *   4. quality gate (token band + stopword ratio)
  *   5. NB classifier gate (q103's model as a persisted NBModelStore —
  *      train once on seed sources, score survivors, drop the low tail)
  *   6. benchmark decontamination (8-gram overlap vs the eval slice,
  *      broadcast eval side)
  *   7. scale-safe stratified sample (per-row hash threshold, q61 path)
  *   8. training-sequence packing manifest (q64 path) + z-ordered landing
  *      (operators/ZOrder: two-column min/max envelopes for pruning)
  *
  * Every stage is the same code the oracled queries run; the demo prints
  * the survivor count per stage (monotone non-increasing through 1-6) and
  * the final packing manifest.
  *
  *   sbt "runMain graft.CurateDemo /root/testdata/sf0.01"
  */
object CurateDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = LocalSession()
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def step(name: String)(df: DataFrame): DataFrame = {
      val out = core.Materialize(df)
      stages += ((name, out.count()))
      out
    }

    val raw = step("raw")(Tables.documents(spark, sfDir))

    val deduped = step("exact_dedup")(
      CorpusPipeline.dedupExact(CorpusPipeline.normalize(raw)))

    // q101: cluster near-dups with the PRODUCTION fixpoint CC (q69's
    // bounded-K is the oracle twin), keep each cluster's min-id
    // representative. Docs with no candidate edges are their own cluster
    // (left anti on the non-representative set).
    val clusters = llmops.DedupGraph.connectedComponents(
      llmops.Dedup.neardupEdges(raw))
    val dropDocs = clusters.filter(col("doc_id") =!= col("cluster"))
      .select("doc_id")
    val neardupFree = step("neardup_collapse")(
      deduped.join(broadcast(dropDocs), Seq("doc_id"), "left_anti"))

    val redacted = step("pii_redact")(
      neardupFree.withColumn("text_norm",
        TextAnalysis.redactPii(col("text_norm"))))

    val quality = step("quality_gate")(
      CorpusPipeline.qualityFilter(redacted,
        minTokens = 20, maxTokens = 300, maxStopRatio = 0.15))

    // NB classifier gate (q103's model as a persisted store): train on
    // the seed sources once, score every survivor against the broadcast
    // model, drop the low-scoring tail
    val nbDir = graft.core.TempDirs.scratch("curate-nb")
    llmops.CurationOps.NBModelStore.build(raw, nbDir)
    val nbScores = llmops.CurationOps.NBModelStore
      .scoreBatch(spark, nbDir,
        quality.select(col("doc_id"), col("text_norm").as("text")))
      .filter(col("nb_logodds") >= -0.05)
      .select("doc_id")
    val classified = step("classifier_gate")(
      quality.join(broadcast(nbScores), Seq("doc_id"), "left_semi"))

    // decontaminate against the eval slice (doc_id < 10), q58's shape
    val evalGrams = Dedup.shingles(raw.filter(col("doc_id") < 10), 8)
      .select("shingle").distinct()
    val contaminated = Dedup.shingles(classified.filter(col("doc_id") >= 10), 8)
      .join(broadcast(evalGrams), "shingle")
      .select("doc_id").distinct()
    val clean = step("decontaminate")(
      classified.filter(col("doc_id") >= 10)
        .join(broadcast(contaminated), Seq("doc_id"), "left_anti"))

    val sampled = step("stratified_sample")(
      clean.filter(CorpusPipeline.hashFrac(col("doc_id")) <
        CorpusPipeline.rateCutoffHex(0.5)))

    // day-2 story: land the curated batch's SIGNATURES so tomorrow's
    // increment dedups against it without rescanning (IncrementalDedup)
    val storeDir = graft.core.TempDirs.scratch("curate-store")
    llmops.IncrementalDedup.buildStore(sampled.drop("text_norm"), storeDir)
    val (exactHits, nearHits) = llmops.IncrementalDedup.dedupeBatch(
      spark, storeDir, sampled.drop("text_norm").limit(50)) // re-offer 50 landed docs
    stages += (("store_exact_hits", exactHits.count()))
    stages += (("store_near_hits", nearHits.count()))

    // leakage-free split of the survivors: assignment unit = near-dup
    // cluster (q79), so no dup group straddles train/eval
    val splitAssign = llmops.Dedup.leakageFreeSplit(sampled)
    val splitCounts = splitAssign.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    println("== curation funnel ==")
    stages.foreach { case (n, c) => println(f"  $n%-18s $c%7d docs") }
    val counts = stages.map(_._2).take(8) // funnel stages only
    require(counts.tail.zip(counts.tail.tail).forall { case (a, b) => b <= a },
      "curation funnel must be monotone non-increasing after raw")
    require(stages.find(_._1 == "store_exact_hits").get._2 > 0,
      "re-offered curated docs must hit the signature store")
    println("== leakage-free split (cluster-keyed, q79) ==")
    splitCounts.toSeq.sortBy(_._1).foreach { case (s, c) => println(f"  $s%-6s $c%6d docs") }

    println("== packing manifest (2048-token blocks, 16 shards/source) ==")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sampled
      .select(col("source"), (col("doc_id") % 16).as("shard"),
        col("doc_id"), size(split(col("text_norm"), " ")).cast("long").as("tokens"))
      .withColumn("cum", sum("tokens").over(w))
      .groupBy("source")
      .agg(countDistinct("shard").as("shards"),
        count(lit(1)).as("docs"),
        max("cum").as("max_shard_tokens"),
        sum("tokens").as("total_tokens"))
      .orderBy("source")
      .collect()
      .foreach(r => println(f"  ${r.getString(0)}%-8s shards=${r.getLong(1)}%2d docs=${r.getLong(2)}%6d total_tokens=${r.getLong(4)}%9d"))

    // land the curated corpus z-ordered on (doc_id, n_chars): every file
    // gets a tight min/max envelope on BOTH columns, so snapshot reads
    // filtered by either prune at row-group grain (operators/ZOrder)
    // Deliberately NOT TempDirs.scratch: this directory is the demo's
    // ADVERTISED end product (printed below for post-run inspection of
    // the z-ordered layout); the shutdown hook would reap it the moment
    // the JVM exits. The nb/store scratch dirs above carry no such
    // contract and stay hook-reaped.
    val lakeDir = java.nio.file.Files.createTempDirectory("curate-lake").toString
    operators.ZOrder.clusterBy(
        sampled.select("doc_id", "text_norm", "lang", "source", "n_chars"),
        "doc_id", "n_chars", 8)
      .write.mode("overwrite").parquet(lakeDir)
    val nFiles = new java.io.File(lakeDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    println(s"== landed z-ordered curated lake: $nFiles files at $lakeDir ==")
    spark.stop()
  }
}
