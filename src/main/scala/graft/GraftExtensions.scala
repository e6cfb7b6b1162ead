package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.HashExpressions.{DotProduct, MinHashSig, ShingleHash, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT simhash64(...)")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` — or via
  * `spark.sql.extensions=graft.GraftExtensions` in config (the standard
  * plugin path for a Spark cluster, no code changes needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    // shingle_hash(tokens, n): n must be a literal — it shapes the
    // generated loop, exactly like the width argument of the built-in
    // `ngrams`-style functions
    ext.injectFunction((
      new FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      (children: Seq[Expression]) => ShingleHash(children(0),
        children(1).eval().asInstanceOf[Number].intValue())))
    // minhash_sig(hashes): bound to the engine's standard seeded
    // 128-permutation basis, so SQL-produced signatures are band-
    // compatible with every signature the Scala dedup path emits
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head,
        graft.operators.Dedup.permA, graft.operators.Dedup.permB,
        graft.operators.Dedup.P)))
    // the custom-operator tier rides the same plugin: sessions built with
    // spark.sql.extensions=graft.GraftExtensions can plan AsOfJoinPlan /
    // IntervalJoinPlan without touching spark.experimental
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}

object GraftExtensions {
  /** Runtime registration for an ALREADY-RUNNING session (the builder path
    * above only applies at session construction — `getOrCreate` on an
    * existing session silently ignores `withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (children: Seq[Expression]) => SimHash64(children.head), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      (children: Seq[Expression]) => DotProduct(children(0), children(1)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hash",
      (children: Seq[Expression]) => ShingleHash(children(0),
        children(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      (children: Seq[Expression]) => MinHashSig(children.head,
        graft.operators.Dedup.permA, graft.operators.Dedup.permB,
        graft.operators.Dedup.P), "built-in")
  }
}
