package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.FloatVectorDot

/** Session extension registering graft's custom expressions for SQL use:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  *
  * The extension-point path (SparkSessionExtensions → injectFunction) is
  * the supported way to add native expressions without forking the
  * analyzer; DataFrame callers can use
  * [[graft.functions.VectorFunctions.vec_dot]] directly without it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[FloatVectorDot].getName, name),
        builder))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** The shared name → expression-builder registry. (Aggregate builders
    * return the AggregateFunction; the analyzer wraps it.)
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => FloatVectorDot(exprs(0), exprs(1))),
    "minhash_sketch" -> (exprs => graft.functions.MinHashSketchAgg(
      exprs.head, graft.llmops.Dedup.minhashParams, graft.llmops.Dedup.MersennePrime)),
    "simhash_sketch" -> (exprs => graft.functions.SimHashSketchAgg(exprs.head)),
    "sig_agreement" -> (exprs =>
      graft.functions.LongArrayAgreement(exprs(0), exprs(1))),
    // k must be a foldable literal (the aggregate's state size is fixed
    // at plan time): freq_sketch(term, 256)
    "freq_sketch" -> (exprs => graft.functions.FreqSketchAgg(
      exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())))

  /** Register on an already-running session (extensions only take effect
    * for sessions created with `.withExtensions` / `spark.sql.extensions`).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerTempFunction(spark, name, builder)
    }
}
