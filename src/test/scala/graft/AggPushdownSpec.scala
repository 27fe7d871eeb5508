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

  test("time-slice range predicate reaches the parquet scan on the raw ts") {
    // q_time_slice filters the PHYSICAL ts column (Tables.eventsRaw), so
    // the range predicate must appear in PushedFilters — row-group
    // min/max pruning at 100 TB. The contrast half pins the caveat
    // SCALING.md documents: the same slice through Tables.events'
    // NORMALIZED (derived) ts column cannot push.
    // Specifically the RANGE predicates — IsNotNull(ts) still pushes
    // through the derived column (null-implication survives the
    // rewrite); range pruning is what the raw-column pattern buys.
    val tsRe =
      "PushedFilters: \\[[^\\]]*(GreaterThanOrEqual|LessThan)\\(ts".r
    val q = SparkEntry.queries("q_time_slice")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(tsRe.findFirstIn(plan).isDefined,
      s"ts range filter not pushed to the parquet scan:\n${plan.take(1200)}")
    val totalSliced = q.agg(sum(col("n"))).collect()(0).getLong(0)
    // Equivalent slice on the normalized nanos-Long contract column.
    val norm = Tables.events(spark, sfDir)
      .filter(col("ts") >= 1704672000000000000L &&
        col("ts") < 1705276800000000000L)
    assert(norm.count() === totalSliced,
      "raw-column slice and normalized-column slice must select the same rows")
    // On the TIMESTAMP fixture generation the normalized column is
    // derived, so its filter must NOT reach the scan (on the legacy
    // nanos-Long generation events IS the raw column and pushes — skip).
    if (Tables.eventsRaw(spark, sfDir).schema("ts").dataType !=
        org.apache.spark.sql.types.LongType) {
      val nplan = norm.queryExecution.executedPlan.toString
      assert(tsRe.findFirstIn(nplan).isEmpty,
        "derived-column filter unexpectedly pushed — update SCALING.md's " +
          "time-sliced-scan guidance if Spark learned to invert the rewrite")
    }
  }
}
