package graft.schema

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkTestBase
import graft.schema.SchemaCompat._

/** E1/E2 semantics per README.md:127-141 and the FIXTURES.md schema pair:
  * v1 = {boolean,int,long,float,double}; v2 = v1 + optional defaulted
  * string (`TestDataWriterAvro.java:412-414`).
  */
class SchemaCompatSpec extends SparkTestBase {

  private val v1 = StructType(Seq(
    StructField("boolean", BooleanType, nullable = false),
    StructField("int", IntegerType, nullable = false),
    StructField("long", LongType, nullable = false),
    StructField("float", FloatType, nullable = false),
    StructField("double", DoubleType, nullable = false)))

  private val v2 = StructType(v1.fields :+ StructField("string", StringType, nullable = true,
    new MetadataBuilder().putString("default", "abc").build()))

  test("NONE rotates on any schema change (E1)") {
    assert(!None_.shouldChangeSchema(v1, v1))
    assert(None_.shouldChangeSchema(v1, v2))
    assert(None_.shouldChangeSchema(v2, v1))
  }

  test("BACKWARD/FULL accept old (projectable-up) records without rotation") {
    // current = latest (v2); incoming old v1 records project up: no change
    assert(!Backward.shouldChangeSchema(v2, v1))
    assert(!Full.shouldChangeSchema(v2, v1))
    // incoming NEW schema (current v1, incoming v2): must rotate
    assert(Backward.shouldChangeSchema(v1, v2))
  }

  test("projectability: numeric widening ok, narrowing not") {
    val wide = StructType(Seq(StructField("x", LongType)))
    val narrow = StructType(Seq(StructField("x", IntegerType)))
    assert(isProjectable(narrow, wide))
    assert(!isProjectable(wide, narrow))
    assert(isProjectable(v1, v2))
    assert(!isProjectable(v2, v1)) // v2's string has nowhere to go in v1
  }

  test("project fills missing fields with metadata default / null (E2)") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(true, 12, 12L, 12.2f, 12.2)).asJava, v1)
    val projected = SchemaCompat.project(df, v2)
    assert(projected.schema.fieldNames.toSeq == v2.fieldNames.toSeq)
    val row = projected.collect().head
    assert(row.getString(5) == "abc") // defaulted new field
    assert(row.getBoolean(0) && row.getInt(1) == 12)
  }

  test("project drops unknown fields and casts widened numerics") {
    import scala.jdk.CollectionConverters._
    val src = StructType(Seq(
      StructField("x", IntegerType), StructField("extra", StringType)))
    val tgt = StructType(Seq(StructField("x", LongType)))
    val df = spark.createDataFrame(Seq(Row(7, "drop-me")).asJava, src)
    val out = SchemaCompat.project(df, tgt)
    assert(out.schema == tgt.copy(fields = tgt.fields.map(_.copy(nullable = true))) ||
      out.schema.fieldNames.toSeq == Seq("x"))
    assert(out.collect().head.getLong(0) == 7L)
  }
}
