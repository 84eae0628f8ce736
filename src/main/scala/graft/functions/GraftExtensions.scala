package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for the native expressions: `graft_dot`,
  * `graft_minhash_signature`, `graft_word_shingles`, `graft_simhash`,
  * `graft_rolling_fingerprint`, `graft_sign_lsh_buckets`,
  * `graft_zvalue`, `graft_normalize_text`.
  *
  * Install on new sessions via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the canonical
  * `SparkSessionExtensions` path) or on a live session with
  * [[GraftFunctions.register]].
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
  }

  private def bool(e: Expression, what: String): Boolean = e match {
    case Literal(b: Boolean, _) => b
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a boolean literal, got $other")
  }

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[NativeExprs.DotProductExpr].getName,
        "graft_dot"),
      (args: Seq[Expression]) => NativeExprs.DotProductExpr(args(0), args(1))),
    (FunctionIdentifier("graft_minhash_signature"),
      new ExpressionInfo(classOf[NativeExprs.MinHashSignatureExpr].getName,
        "graft_minhash_signature"),
      (args: Seq[Expression]) => NativeExprs.MinHashSignatureExpr(args(0),
        intArg(args(1), "k"), intArg(args(2), "numHashes"))),
    (FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[NativeExprs.WordShinglesExpr].getName,
        "graft_word_shingles"),
      (args: Seq[Expression]) => NativeExprs.WordShinglesExpr(args(0),
        intArg(args(1), "k"),
        if (args.length > 2) bool(args(2), "distinct") else false)),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[NativeExprs.SimHashExpr].getName,
        "graft_simhash"),
      (args: Seq[Expression]) => NativeExprs.SimHashExpr(args(0),
        intArg(args(1), "bits"))),
    (FunctionIdentifier("graft_rolling_fingerprint"),
      new ExpressionInfo(classOf[NativeExprs.RollingFingerprintExpr].getName,
        "graft_rolling_fingerprint"),
      (args: Seq[Expression]) => NativeExprs.RollingFingerprintExpr(args(0),
        intArg(args(1), "k"))),
    (FunctionIdentifier("graft_sign_lsh_buckets"),
      new ExpressionInfo(classOf[NativeExprs.SignLshBucketsExpr].getName,
        "graft_sign_lsh_buckets"),
      // (vec, bits, dims, seed[, tables])
      (args: Seq[Expression]) => NativeExprs.SignLshBucketsExpr(args(0),
        intArg(args(1), "bits"), intArg(args(2), "dims"),
        intArg(args(3), "seed").toLong,
        if (args.length > 4) intArg(args(4), "tables") else 1)),
    (FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[NativeExprs.ZInterleaveExpr].getName,
        "graft_zvalue"),
      (args: Seq[Expression]) => NativeExprs.ZInterleaveExpr(args(0),
        args(1), intArg(args(2), "bits"))),
    (FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NativeExprs.NormalizeTextExpr].getName,
        "graft_normalize_text"),
      (args: Seq[Expression]) => NativeExprs.NormalizeTextExpr(args(0))),
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[NativeExprs.HammingDistanceExpr].getName,
        "graft_hamming"),
      (args: Seq[Expression]) => NativeExprs.HammingDistanceExpr(args(0),
        args(1))),
    (FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv"),
      (args: Seq[Expression]) => KmvSketchAgg(args(0),
        intArg(args(1), "k"))),
    (FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "graft_cms"),
      (args: Seq[Expression]) => CmsSketchAgg(args(0),
        intArg(args(1), "depth"), intArg(args(2), "width"))),
    (FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "graft_hll"),
      (args: Seq[Expression]) => HllSketchAgg(args(0))))

  /** Register on a live session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      ColumnBridge.registerFunction(spark, id, info, builder)
    }
}

/** `spark.sql.extensions` entry point: native SQL functions, the
  * custom top-k strategy, and the window-top-k optimizer rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKey.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JoinEliminate)
    // conf-gated (spark.graft.mvRewrite.enabled, default off) + empty
    // catalog ⇒ injection is a no-op until a caller opts in
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
  }
}
