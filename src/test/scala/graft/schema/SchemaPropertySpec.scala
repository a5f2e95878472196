package graft.schema

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.schema.SchemaCompat._

/** ScalaCheck-generator property tests (SURVEY.md §5: "property tests for
  * schema projection and partitioner determinism"). Plain scalacheck Gen
  * sampled with a fixed seed (the scalatest-scalacheck bridge isn't in the
  * offline dependency set).
  */
class SchemaPropertySpec extends SparkTestBase {

  private val typeGen: Gen[DataType] =
    Gen.oneOf(IntegerType, LongType, FloatType, DoubleType, StringType, BooleanType)

  private val schemaGen: Gen[StructType] = for {
    names <- Gen.someOf(Seq("f1", "f2", "f3", "f4", "f5")).suchThat(_.nonEmpty)
    types <- Gen.listOfN(names.size, typeGen)
  } yield StructType(names.zip(types).map { case (n, t) => StructField(n, t) }.toSeq)

  /** Deterministic sample stream of `n` values from `g`. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: a schema is always projectable onto itself, never changes") {
    samples(schemaGen, 60).foreach { st =>
      assert(isProjectable(st, st))
      assert(!None_.shouldChangeSchema(st, st))
      assert(!Backward.shouldChangeSchema(st, st))
      assert(!Forward.shouldChangeSchema(st, st))
    }
  }

  test("property: dropping a field keeps BACKWARD happy, adding one rotates") {
    samples(schemaGen, 60).filter(_.size >= 2).foreach { st =>
      val dropped = StructType(st.fields.dropRight(1))
      // incoming OLD (subset) record under latest `st`: projectable up
      assert(!Backward.shouldChangeSchema(st, dropped))
      // incoming NEW (superset) schema under old `dropped`: must rotate
      assert(Backward.shouldChangeSchema(dropped, st))
    }
  }

  test("property: numeric widening projectability is antisymmetric") {
    val nums = Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    for (a <- nums; b <- nums if a != b) {
      val sa = StructType(Seq(StructField("x", a)))
      val sb = StructType(Seq(StructField("x", b)))
      assert(isProjectable(sa, sb) != isProjectable(sb, sa), s"$a vs $b")
    }
  }

  test("property: project() output always matches the target field names/types") {
    import scala.jdk.CollectionConverters._
    val src = StructType(Seq(
      StructField("f1", IntegerType), StructField("f2", StringType)))
    val df = spark.createDataFrame(Seq(Row(1, "x")).asJava, src)
    samples(schemaGen, 25).foreach { target =>
      val out = SchemaCompat.project(df, target)
      assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        target.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }

  test("property: partitioner encoding is deterministic across evaluations") {
    import org.apache.spark.sql.functions._
    val df = kafkaRecords("t", 2, 50)
    Seq(
      graft.partition.DefaultPartitioner,
      graft.partition.HourlyPartitioner(),
      graft.partition.FieldPartitioner("b")).foreach { p =>
      val once = df.select(col("offset"), p.encodePartition.as("e")).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
      val twice = df.select(col("offset"), p.encodePartition.as("e")).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(once == twice)
    }
  }
}
