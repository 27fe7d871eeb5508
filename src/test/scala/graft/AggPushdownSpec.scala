package graft

import org.apache.spark.sql.functions._

/** Parquet aggregate pushdown: whole-table / per-partition MIN / MAX /
  * COUNT can be answered from parquet footer statistics without reading
  * a single data page — at 100 TB that's the difference between a
  * metadata operation and a full scan. Requires the v2 parquet source
  * (`useV1SourceList` without parquet) + `parquet.aggregatePushdown`;
  * this spec pins both the plan shape (`PushedAggregation`) and result
  * equality so the capability can't silently regress.
  */
class AggPushdownSpec extends SparkSpec {

  test("MIN/MAX/COUNT are answered from parquet footers, not data pages") {
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(min(col("l_shipdate")), max(col("l_shipdate")), count(lit(1)))
      .collect()(0)
    // Isolated session (own SQLConf, shared context): suites run in
    // parallel in one JVM — switching the shared session to the v2
    // source would change other suites' plans mid-flight.
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    val q = s.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"),
        count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"aggregate not pushed to the parquet scan:\n${plan.take(800)}")
    assert(q.collect()(0) === expected)
  }
}
