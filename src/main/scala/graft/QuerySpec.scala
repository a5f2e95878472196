package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-checks it against. `oracle = None` → driver records a rows-only
  * check (used for hash-seeded/approximate ops like MinHash-LSH).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
