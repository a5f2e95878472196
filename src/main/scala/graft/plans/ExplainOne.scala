package graft.plans

/** Print one registry query's executed plan (runMain graft.plans.ExplainOne <name> [sfDir]). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession()
    val df = graft.QueryRegistry.byName(args(0))
      .run(spark, if (args.length > 1) args(1) else "/root/testdata/sf0.1")
    df.queryExecution.executedPlan // force planning
    println(df.queryExecution.executedPlan.treeString.linesIterator
      .filter(_.toLowerCase.contains("join")).mkString("\n"))
    spark.stop()
  }
}
