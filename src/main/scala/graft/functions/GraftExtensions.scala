package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration for the custom Catalyst expressions, so
  * `spark.sql("SELECT gunzip(payload) ...")` works alongside the Column
  * API. Two paths:
  *
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) for new sessions;
  *  - runtime: `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => b(exprs)))
    }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "gunzip" -> (exprs => Gunzip(exprs.head)),
    "gzip" -> (exprs => Gzip(exprs.head)),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "rolling_fingerprint" -> (exprs =>
      RollingFingerprint(exprs(0), intArg(exprs(1), "window"))))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftColumnBridge.registerFunction(spark, name, b)
    }
}
