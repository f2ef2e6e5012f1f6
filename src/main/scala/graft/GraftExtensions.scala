package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.SnappyDecode

/** SparkSessionExtensions entry point: registers the engine's native
  * functions at session build time, so
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `snappy_decode` available
  * in every session — including SQL-only clients — without per-session
  * imperative registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("snappy_decode"),
      new ExpressionInfo(classOf[SnappyDecode].getName, "snappy_decode"),
      (exprs: Seq[Expression]) => SnappyDecode(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => graft.functions.NfcNormalize(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.ArrayDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => graft.functions.ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_dot_int"),
      new ExpressionInfo(classOf[graft.functions.ArrayDotInt].getName, "graft_dot_int"),
      (exprs: Seq[Expression]) => graft.functions.ArrayDotInt(exprs(0), exprs(1))))
  }
}
