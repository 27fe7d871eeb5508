package graft

import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter row pruning — the 100 TB lever for
  * selective dim→fact joins that can't broadcast: the optimizer builds
  * a bloom filter from the (filtered) dimension keys and injects a
  * `might_contain` gate on the fact side BEFORE its first shuffle, so
  * non-matching fact rows never enter an exchange. This spec pins the
  * injection conditions so the capability can't silently regress with
  * a Spark upgrade or a conf change.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom gate before the fact shuffle") {
    // Isolated session (own SQLConf, shared context): suites run in
    // parallel in one JVM, so mutating the shared session's broadcast
    // threshold would warp OTHER suites' plans mid-flight.
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local test data is tiny; production defaults (10GB application-
    // side minimum) would decline injection at sf0.001
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def query(sess: org.apache.spark.sql.SparkSession) = {
      val fact = Tables.lineitem(sess, sfDir)
        .groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("qty"))
      val dim = Tables.part(sess, sfDir).filter(col("p_type") === "PROMO")
      fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type")).agg(sum(col("qty")).cast("long").as("q"))
    }
    val j = query(s)
    val lplan = j.queryExecution.optimizedPlan.toString
    assert(lplan.contains("bloom_filter_agg"),
      "no bloom filter built from the dimension keys")
    assert(lplan.contains("might_contain"),
      "no bloom gate injected on the fact side")
    // the gate sits under the fact-side aggregate (prunes pre-shuffle)
    val gateIdx = lplan.indexOf("might_contain")
    val aggIdx = lplan.indexOf("Aggregate [l_partkey")
    assert(aggIdx >= 0 && gateIdx > aggIdx,
      "bloom gate must prune below the fact aggregate")
    // and the filtered result is identical to the default-conf run
    assert(j.collect().toSet === query(spark).collect().toSet)
  }
}
