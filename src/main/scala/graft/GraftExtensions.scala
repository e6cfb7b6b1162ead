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
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      buildSimhash))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      buildDot))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      buildShingle))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      buildMinhash))
    // the custom-operator tier rides the same plugin: sessions built with
    // spark.sql.extensions=graft.GraftExtensions can plan AsOfJoinPlan /
    // IntervalJoinPlan without touching spark.experimental
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}

object GraftExtensions {
  /** ONE validated builder per SQL function, shared by the extension
    * injection above and [[register]] below (round-17 review): the old
    * inline `children(1).eval().asInstanceOf[Number].intValue()` turned
    * every SQL misuse — wrong arity, NULL n, a string literal, a
    * non-foldable column argument — into a raw IndexOutOfBounds / NPE /
    * ClassCast from deep inside analysis, instead of an error naming
    * the function and its contract. */
  private def requireArity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${children.length}")

  private[graft] val buildSimhash: Seq[Expression] => Expression = { children =>
    requireArity("simhash64", children, 1)
    SimHash64(children.head)
  }
  private[graft] val buildDot: Seq[Expression] => Expression = { children =>
    requireArity("dot_product", children, 2)
    DotProduct(children(0), children(1))
  }
  // shingle_hash(tokens, n): n must be a literal — it shapes the
  // generated loop, exactly like the width argument of the built-in
  // `ngrams`-style functions
  private[graft] val buildShingle: Seq[Expression] => Expression = { children =>
    requireArity("shingle_hash", children, 2)
    val nExpr = children(1)
    if (!nExpr.foldable)
      throw new IllegalArgumentException(
        "shingle_hash: n must be a literal integer (it shapes the " +
          "generated loop), not a column or non-foldable expression")
    nExpr.eval() match {
      case n: Number => ShingleHash(children(0), n.intValue())
      case null => throw new IllegalArgumentException(
        "shingle_hash: n must not be NULL")
      case _ => throw new IllegalArgumentException(
        s"shingle_hash: n must be an integer literal, got " +
          s"${nExpr.dataType.catalogString}")
    }
  }
  // minhash_sig(hashes): bound to the engine's standard seeded
  // 128-permutation basis, so SQL-produced signatures are band-
  // compatible with every signature the Scala dedup path emits
  private[graft] val buildMinhash: Seq[Expression] => Expression = { children =>
    requireArity("minhash_sig", children, 1)
    MinHashSig(children.head,
      graft.operators.Dedup.permA, graft.operators.Dedup.permB,
      graft.operators.Dedup.P)
  }

  /** Runtime registration for an ALREADY-RUNNING session (the builder path
    * above only applies at session construction — `getOrCreate` on an
    * existing session silently ignores `withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", buildSimhash, "built-in")
    reg.createOrReplaceTempFunction("dot_product", buildDot, "built-in")
    reg.createOrReplaceTempFunction("shingle_hash", buildShingle, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", buildMinhash, "built-in")
  }
}
