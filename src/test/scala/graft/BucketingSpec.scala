package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join: same key, same bucket count on both sides
  * must plan with no shuffle exchange on the join path. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // Isolated session (own SQLConf, shared catalog/context): suites
    // run in parallel in one JVM, so the -1 broadcast threshold must
    // not leak into other suites' plans.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(s, sfDir)
      val ord = Tables.orders(s, sfDir)
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
      Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 4)
      val joined = Bucketing.bucketedEquiJoin(s, "li_b", "ord_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // and it is still a correct join
      assert(joined.count() ===
        li.join(ord, $"l_orderkey" === $"o_orderkey").count())
    } finally {
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
