package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, StringType}

/** SQL registration for the custom Catalyst expressions, so
  * `spark.sql("SELECT gunzip(payload) ...")` works alongside the Column
  * API. Two paths:
  *
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) for new sessions;
  *  - runtime: `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, b) =>
      e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => b(exprs)))
    }
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // SQL args arrive untyped (no analyzer coercion for injected functions),
  // so wrap each child with the same Cast the Column API applies in
  // `graft.functions.functions` — otherwise e.g. gunzip(string_col) reaches
  // nullSafeEval's asInstanceOf and fails at runtime instead of analysis.
  private def as(e: Expression, t: DataType): Expression =
    if (e.resolved && e.dataType == t) e else Cast(e, t)

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "gunzip" -> (exprs => Gunzip(as(exprs.head, BinaryType))),
    "try_gunzip" -> (exprs =>
      org.apache.spark.sql.catalyst.expressions.TryEval(
        Gunzip(as(exprs.head, BinaryType)))),
    "gzip" -> (exprs => Gzip(as(exprs.head, BinaryType))),
    "dot_product" -> (exprs => DotProduct(
      as(exprs(0), ArrayType(DoubleType)), as(exprs(1), ArrayType(DoubleType)))),
    "l2_sq" -> (exprs => L2Sq(
      as(exprs(0), ArrayType(DoubleType)), as(exprs(1), ArrayType(DoubleType)))),
    "rolling_fingerprint" -> (exprs =>
      RollingFingerprint(as(exprs(0), StringType), intArg(exprs(1), "window"))),
    "cdc_cuts" -> (exprs =>
      CdcCutPositions(as(exprs(0), StringType), intArg(exprs(1), "window"),
        intArg(exprs(2), "divisor"))),
    "winnow_fingerprints" -> (exprs =>
      WinnowFingerprints(as(exprs(0), StringType), intArg(exprs(1), "window"),
        intArg(exprs(2), "winnowW"))),
    "zorder2" -> (exprs => ZOrder2(
      as(exprs(0), org.apache.spark.sql.types.LongType),
      as(exprs(1), org.apache.spark.sql.types.LongType),
      intArg(exprs(2), "bits"))),
    "trigram_entropy" -> (exprs => TrigramEntropy(as(exprs.head, StringType))),
    "minhash_sigs" -> (exprs =>
      MinHashSigs(as(exprs(0), StringType), intArg(exprs(1), "numHashes"))))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      GraftColumnBridge.registerFunction(spark, name, b)
    }
    GraftColumnBridge.addStrategy(spark, graft.plans.GraftStrategy)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.TopKWindowRewrite)) {
      spark.experimental.extraOptimizations =
        graft.plans.TopKWindowRewrite +: spark.experimental.extraOptimizations
    }
  }
}
