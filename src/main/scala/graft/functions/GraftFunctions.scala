package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions: makes `cpf_clean`
  * and `token_hash32_array` callable from `spark.sql(...)` text, not
  * just the DataFrame API — the last piece of "a user of the reference
  * could switch" (their tooling may only speak SQL).
  *
  * Two registration paths, same builders:
  *  - [[GraftExtensions]] for config-time injection
  *    (`spark.sql.extensions=graft.functions.GraftExtensions`) — the
  *    cluster deployment path;
  *  - [[GraftFunctions.register]] for an already-running session — the
  *    embedded/test path (SparkSessionExtensions only apply at session
  *    build, and getOrCreate reuses existing sessions).
  */
object GraftFunctions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cpf_clean" -> (args => CpfClean(args.head)),
    "token_hash32_array" -> (args => TokenHashArray(args.head)),
    "shingle_hashes3" -> (args => ShingleHashes3(args.head)),
    // k must be a foldable literal: the signature width shapes the
    // expression itself, so a per-row k is unrepresentable. Check before
    // eval — a column argument would otherwise surface as an obscure
    // UnresolvedException from eval() instead of an analysis error.
    "minhash_signature" -> (args => {
      require(args.length == 2,
        s"minhash_signature(tokens, k) takes 2 arguments, got ${args.length}")
      require(args(1).foldable,
        "minhash_signature k must be a literal (the signature width is fixed " +
        "at plan time); got non-foldable: " + args(1).sql)
      val k = args(1).eval()
      require(k != null, "minhash_signature k must not be NULL")
      MinhashSignature(args(0), k.asInstanceOf[Number].intValue)
    }),
    "simhash32" -> (args => Simhash32(args(0), args(1))),
    "vec_dot" -> (args => VecDot(args(0), args(1))),
    "vec_norm_sq" -> (args => VecNormSq(args.head)),
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => CpfCleanIdempotence)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
