package graft.plans

/** One-shot smoke of the driver contract: entry() rows > 0 at sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    spark.stop()
  }
}
