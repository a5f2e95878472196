package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed tables — the third leg of the join-scale
  * toolkit next to `broadcast()` (small dims) and `SkewJoin` (salted hot
  * keys): persist both fact tables bucketed AND sorted by the join key,
  * and every subsequent equi-join on that key runs with NO shuffle and NO
  * sort on either side — at 100 TB that's the difference between a nightly
  * join re-shuffling the whole corpus and one that streams merge-joins
  * bucket-by-bucket.
  *
  * Spark-native mechanics (no custom code needed at read time): the
  * writer records bucket spec in the catalog; the planner recognizes
  * matching `HashPartitioning(key, n)` on both sides and drops the
  * exchanges (`spark.sql.sources.bucketing.enabled`, on by default).
  * Both sides must agree on bucket count (or be integer multiples with
  * `bucketing.autoBucketedScan`).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted parquet table. `sortBy` the same
    * key so downstream sort-merge joins also skip their per-task sorts.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. Plain
    * `spark.table(a).join(spark.table(b), key)` — the value is in the
    * PLAN this produces: zero Exchange operators when both sides are
    * bucketed on `key` with equal counts (assert it with
    * [[exchangeCount]]).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of shuffle Exchange operators in the df's physical plan —
    * the testable definition of "co-located". Must descend into
    * `AdaptiveSparkPlanExec` explicitly: AQE's wrapper node reports no
    * children to the standard `collect` traversal, which would count 0
    * exchanges for EVERY query.
    */
  def exchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        1 + e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
