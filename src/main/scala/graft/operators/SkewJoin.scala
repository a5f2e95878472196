package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (the "salting for skew" scale tool).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) handles most runtime skew; explicit salting remains the
  * tool when one key dominates so heavily that even split partitions of it
  * must land on different executors AND the other side is small enough to
  * replicate.
  *
  * `saltedEquiJoin` replicates the (smaller) right side `salts`× and
  * splits the left side deterministically by hashing a unique column —
  * turning one hot key's partition into `salts` partitions. Result rows
  * are identical to a plain equi-join.
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftUniqueCol: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft
      .join(replicatedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
