package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing surface: registers every testdata table as a temp view and
  * the custom expressions as SQL functions, so the whole engine is
  * drivable from `spark.sql(...)` — the Column API (SparkEntry.queries)
  * and the SQL text surface resolve to the same Catalyst plans.
  */
object Catalog {
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.functions.GraftExtensions.register(spark)
  }
}
