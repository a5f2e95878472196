package graft.plans

/** Diagnostic sweep (runMain graft.plans.BroadcastAudit <sfDir>): print
  * every registry query with [[PlanGate.hintViolations]] — the explicit
  * broadcast() hints whose side is not structurally bounded (since
  * round 9 there is no key-domain auto-pass; every such hint must be
  * whitelisted by name). The CI-enforced version (with the reviewed
  * whitelist) lives in PlanGateSpec; this main exists for ad-hoc sweeps
  * while developing a query.
  */
object BroadcastAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.LocalSession()
    graft.QueryRegistry.all.foreach { q =>
      try {
        val r = PlanGate.hintViolations(q.run(spark, sfDir))
        if (r.nonEmpty) println(s"[bcast-hint] ${q.name}: ${r.mkString(", ")}")
      } catch { case e: Throwable => println(s"[bcast-hint] ${q.name}: ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
