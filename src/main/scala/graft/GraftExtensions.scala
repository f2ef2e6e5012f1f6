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
      new FunctionIdentifier("fold_accents"),
      new ExpressionInfo(classOf[graft.functions.FoldAccents].getName, "fold_accents"),
      (exprs: Seq[Expression]) => graft.functions.FoldAccents(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.ArrayDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => graft.functions.ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_dot_int"),
      new ExpressionInfo(classOf[graft.functions.ArrayDotInt].getName, "graft_dot_int"),
      (exprs: Seq[Expression]) => graft.functions.ArrayDotInt(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_dot_dec"),
      new ExpressionInfo(classOf[graft.functions.ArrayDotDec].getName, "graft_dot_dec"),
      (exprs: Seq[Expression]) => graft.functions.ArrayDotDec(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_matvec_dec"),
      new ExpressionInfo(classOf[graft.functions.DecMatvec].getName, "graft_matvec_dec"),
      (exprs: Seq[Expression]) => graft.functions.DecMatvec(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_jaro"),
      new ExpressionInfo(classOf[graft.functions.JaroSim].getName, "graft_jaro"),
      (exprs: Seq[Expression]) => graft.functions.JaroSim(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(
        classOf[graft.functions.JaroWinklerSim].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => graft.functions.JaroWinklerSim(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_damerau"),
      new ExpressionInfo(
        classOf[graft.functions.DamerauLevenshtein].getName, "graft_damerau"),
      (exprs: Seq[Expression]) => graft.functions.DamerauLevenshtein(exprs(0), exprs(1))))
    // the mergeable sketch Aggregators, SQL-callable (VERDICT r9 item 4):
    // same ScalaAggregator node the typed `udaf()` path plans, so partial
    // aggregation / map-side combine behave identically from SQL text
    e.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.MisraGries].getName, "graft_topk"),
      graft.functions.GraftFunctions.topKBuilder))
    e.injectFunction((
      new FunctionIdentifier("graft_topk_weighted"),
      new ExpressionInfo(
        classOf[graft.functions.MisraGriesWeighted].getName, "graft_topk_weighted"),
      graft.functions.GraftFunctions.topKWeightedBuilder))
    e.injectFunction((
      new FunctionIdentifier("graft_uniq_upto"),
      new ExpressionInfo(classOf[graft.functions.UniqUpTo].getName, "graft_uniq_upto"),
      graft.functions.GraftFunctions.uniqUpToBuilder))
    e.injectFunction((
      new FunctionIdentifier("graft_min_k"),
      new ExpressionInfo(classOf[graft.functions.MinK].getName, "graft_min_k"),
      graft.functions.GraftFunctions.minKBuilder))
    e.injectFunction((
      new FunctionIdentifier("graft_md5_split"),
      new ExpressionInfo(classOf[graft.functions.Md5Split].getName, "graft_md5_split"),
      graft.functions.GraftFunctions.md5SplitBuilder))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
      graft.functions.GraftFunctions.minHashBuilder))
  }
}
