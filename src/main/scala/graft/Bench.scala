package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession()
    // Warm-up: JIT/codegen paths + parquet reader + shuffle machinery, so
    // the first measured query doesn't pay session start-up.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().collect()
    // min of 3 iterations per query: this container shows ±2x run-to-run
    // noise spikes (GC/JIT/scheduling); the min is the standard stable
    // microbenchmark statistic, and 3 samples make a single co-located
    // spike unable to poison a query's recorded time.
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iterations).map { i =>
        val t0 = System.nanoTime()
        // a failed query records a large penalty, never a fast time — a
        // regression must not masquerade as a speed-up.
        // toRdd.count() executes the FULL physical plan (final sort and
        // projection included) — df.count() would let Catalyst collapse
        // the plan to a bare aggregate and under-measure the query.
        val t = try { fn(spark, sfDir).queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); 3600.0
        }
        if (debug) System.err.println(f"[bench] $name iter$i ${t}%.2fs")
        t
      }
      name -> times.min
    }.toMap
    // The driver records only the last ~2000 chars of stdout (BENCH_r03's
    // "tail" field is exactly 2000 chars and the JSON head was clipped →
    // "parsed": null, two rounds running). At 90+ queries even 3-decimal
    // full-name entries are ~3 kB, so the stdout line uses the short query
    // id ("q72" for "q72_canonical_per_cluster" — the contract's own
    // example shape, {"q1":sec}), ~1.2 kB total. The file artifact keeps
    // full names at 3 decimals.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def line(short: Boolean): String = {
      val qs = results.toSeq.sortBy(_._1)
        .map { case (k, v) =>
          val key = if (short) k.takeWhile(_ != '_') else k
          "\"" + key + "\":" + fmt(v)
        }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    println(line(short = true))
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft-bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line(short = false) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    // Append-only history so round-over-round per-query diffs never depend
    // on driver log tail length (BENCH_rN's stdout JSON is tail-truncated
    // past ~2000 chars): each run adds one full-name line stamped with
    // wall-clock epoch seconds.
    val hist = sys.env.getOrElse("SPARK_GRAFT_BENCH_HIST", "/tmp/graft-bench-history.jsonl")
    try java.nio.file.Files.write(java.nio.file.Paths.get(hist),
      (s"""{"ts":${System.currentTimeMillis / 1000},""" +
        line(short = false).drop(1) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable => System.err.println(s"[bench] history write failed: ${e.getMessage}") }
    spark.stop()
  }
}
