package graft

import org.apache.spark.sql.SparkSession

/** The ONE definition of the local session every main (Bench, Verify,
  * Profile, ScaleSmoke) runs on. Each main used to carry its own copy of
  * this builder block — which is exactly how a scaffold-era `local[4]`
  * default survived a whole round in Bench/Verify while Profile already
  * said 32: shared config must have one home.
  *
  * `spark.sql.legacy.parquet.nanosAsLong`: events.ts is TIMESTAMP(NANOS)
  * parquet — read as nano-longs, truncated to µs timestamps in
  * `Tables.events` (DuckDB-equivalent).
  */
object LocalSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def apply(width: String = cpus): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$width]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
