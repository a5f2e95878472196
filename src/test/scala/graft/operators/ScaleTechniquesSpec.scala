package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryRegistry, SparkTestBase}

/** Plan-quality regression tests + the scale techniques (salting,
  * bucketing) the 100 TB posture relies on.
  */
class ScaleTechniquesSpec extends SparkTestBase {

  private def executedPlan(name: String): String =
    QueryRegistry.byName(name).run(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("plan: q01 pushes the filter into the parquet scan and prunes columns") {
    val p = executedPlan("q01_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("plan: q08 broadcasts the filtered dimension side") {
    val p = executedPlan("q08_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("In(p_brand"), p) // dim filter pushed into its scan
  }

  test("plan: q04 aggregates inside whole-stage codegen with partial agg") {
    val df = QueryRegistry.byName("q04_agg_basic").run(spark, sf("sf0.001"))
    df.collect() // AQE finalizes codegen stages at execution
    val p = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n) Op" in treeString
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("salted join returns identical rows to a plain join under skew") {
    import spark.implicits._
    // 10k rows: 90% on hot key 0, the rest spread over keys 0-4
    val left = spark.range(10000)
      .select(col("id"), when(col("id") % 10 === 0, expr("(id div 10) % 5")).otherwise(0L).as("k"))
    val right = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val plain = left.join(right, "k").select("id", "v")
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", leftUniqueCol = "id", salts = 8)
      .select("id", "v")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("fanOut widens single-file scans, passes multi-file scans through") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fanout")
    spark.range(1000).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/one")
    spark.range(1000).repartition(8).write.mode("overwrite")
      .parquet(s"$dir/many")
    val one = spark.read.parquet(s"$dir/one")
    val many = spark.read.parquet(s"$dir/many")
    val width = spark.sessionState.conf.numShufflePartitions
    assert(Ops.fanOut(one).rdd.getNumPartitions == width)
    // >= width files: passthrough, no repartition node added
    assert(Ops.fanOut(many) eq many)
  }

  test("capKeyFreq drops rows of keys above the frequency cap") {
    import spark.implicits._
    val df = (Seq.fill(50)("hot") ++ Seq("a", "a", "b")).toDF("k")
    val capped = Ops.capKeyFreq(df, maxFreq = 10, col("k"))
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped == Map("a" -> 2L, "b" -> 1L))
  }

  // Bucketed co-located joins (zero-exchange assertion + plain-join
  // contrast) live in BucketingSpec against the real testdata tables.
}
