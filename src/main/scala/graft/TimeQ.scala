package graft

/** Minimal warm-run timer for individual registry queries on any table
  * directory (testdata sf dirs or a ScaleSmoke corpus): three iterations
  * each, full-plan `toRdd.count()` timing. Separates real plan cost from
  * first-run codegen/JIT compile — the ScaleSmoke sweep is one-shot, so
  * its absolute numbers fold both together; this tool shows the floor.
  *
  *   sbt "runMain graft.TimeQ /tmp/graft-scale-10x q65_pii_redaction ..."
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail
    val spark = LocalSession()
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val rows = QueryRegistry.byName(n).run(spark, dir).queryExecution.toRdd.count()
        println(f"[timeq] $n iter$i ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$rows")
      }
    }
    spark.stop()
  }
}
