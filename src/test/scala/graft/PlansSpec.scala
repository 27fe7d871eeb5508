package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

/** The custom TopKPerKey logical/physical operator (graft.plans). */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 9.0)
  ).toDF("k", "id", "score")

  test("matches the row_number window formulation, ties broken by order") {
    val got = TopKPerKey(sample, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id").asc)
    val want = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got === want)
    assert(got === Set(("a", 2L), ("a", 4L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("k larger than any group keeps everything") {
    val got = TopKPerKey(sample, Seq(col("k")),
      Seq(col("score").asc), 100).count()
    assert(got === sample.count())
  }

  test("plans TopKPerKeyExec over a hash exchange on the keys") {
    val df = TopKPerKey(sample, Seq(col("k")), Seq(col("score").desc), 1)
    val physical = df.queryExecution.executedPlan.toString
    // Exec nodeName drops the suffix; AdaptiveSparkPlanExec hides its
    // inner plan from TreeNode traversal, so assert on the rendering.
    assert(physical.contains("TopKPerKey "))
    assert(physical.contains("hashpartitioning(k"))
  }

  test("optimizer rule rewrites the row_number top-k idiom to TopKPerKey") {
    // default-on rewrite; set explicitly on an isolated session anyway
    // (conf is read at optimization time from the query's own session)
    val s2 = spark.newSession()
    s2.conf.set(graft.plans.TopKWindowRewrite.FLAG, "true")
    val sample2 = s2.createDataFrame(sample.collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))).toDF("k", "id", "score")
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    // rank filtered then projected away → rewritten: no window in the plan
    val rewritten = sample2.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select(col("k"), col("id"), col("score"))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan)
    // no window exec; Spark's map-side WindowGroupLimit pre-filter may
    // legitimately remain below the operator
    assert(!plan.contains("Window ["), plan)
    // rank kept in the output → NOT rewritten (the window must survive)
    val kept = sample2.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    assert(kept.queryExecution.executedPlan.toString.contains("Window ["))
    // flag explicitly off → idiom stays on the window path
    val s3 = spark.newSession()
    s3.conf.set(graft.plans.TopKWindowRewrite.FLAG, "false")
    val sample3 = s3.createDataFrame(sample.collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))).toDF("k", "id", "score")
    val off = sample3.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select(col("k"), col("id"), col("score"))
    assert(!off.queryExecution.executedPlan.toString.contains("TopKPerKey "))
    // same rows either way (the order is total, so ties can't differ)
    import s2.implicits._
    val got = rewritten.as[(String, Long, Double)].collect().toSet
    val want = kept.as[(String, Long, Double, Int)].collect()
      .map(t => (t._1, t._2, t._3)).toSet
    assert(got === want)
    assert(got.size === 5)
  }

  test("composes downstream: filter and aggregate over the operator") {
    val q = TopKPerKey(sample, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), 2)
      .groupBy("k").agg(count(lit(1)).as("n"))
    val got = q.as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // outputPartitioning passes the child's hash layout through, so the
    // aggregate on the same key plans NO second exchange (inspect the
    // AQE final plan only — the rendering repeats the initial plan).
    val finalPlan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = finalPlan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges === 1, finalPlan)
  }

  test("property: equals the window formulation on random data") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200 + trial * 100
      val rows = (0 until n).map { i =>
        (s"k${rnd.nextInt(12)}", i.toLong, rnd.nextInt(40).toDouble)
      }
      val df = rows.toDF("k", "id", "score").repartition(5)
      val k = 1 + rnd.nextInt(4)
      val got = TopKPerKey(df, Seq(col("k")),
        Seq(col("score").desc, col("id").asc), k)
        .select("k", "id").as[(String, Long)].collect().toSet
      val w = Window.partitionBy("k").orderBy(col("score").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("k", "id").as[(String, Long)].collect().toSet
      assert(got === want, s"trial $trial (k=$k)")
    }
  }

  test("spills per-key heaps to disk under a forced threshold and stays correct") {
    // High-cardinality keys are the regime that used to OOM the
    // non-spillable heap map. Force the spill path cheaply via
    // Spillable's element-count threshold: SparkEnv.conf is the live
    // object ExternalAppendOnlyMap reads at construction, so a local
    // mutation + restore exercises disk-merged heap runs without a
    // dedicated SparkContext. (Concurrent suites at most spill earlier
    // too — a performance, never a correctness, effect.)
    val sc = spark.sparkContext
    val envConf = org.apache.spark.SparkEnv.get.conf
    val confKey = "spark.shuffle.spill.numElementsForceSpillThreshold"
    val old = envConf.getOption(confKey)
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          spilled.addAndGet(e.taskMetrics.diskBytesSpilled)
    }
    envConf.set(confKey, "2000")
    sc.addSparkListener(listener)
    try {
      val n = 40000
      // ~n/2 distinct keys → ~5k keys per shuffle task, 10k rows per
      // task >> the forced 2k threshold → every task spills.
      val df = spark.range(n).select(
        (col("id") % (n / 2)).as("k"), col("id"),
        (col("id") % 97).cast("double").as("score"))
      val got = TopKPerKey(df, Seq(col("k")),
        Seq(col("score").desc, col("id").asc), 1)
        .select("k", "id").as[(Long, Long)].collect().toSet
      // Oracle in plain Scala: top-1 of (score desc, id asc) per key.
      val want = (0L until n).map(id => (id % (n / 2), id, (id % 97).toDouble))
        .groupBy(_._1).map { case (k, rows) =>
          val best = rows.minBy(r => (-r._3, r._2))
          (k, best._2)
        }.toSet
      assert(got === want)
      org.apache.spark.graft.GraftSpillBridge.waitListenerBus(sc)
      assert(spilled.get() > 0L,
        "expected the forced threshold to drive per-key heaps to disk")
    } finally {
      old match {
        case Some(v) => envConf.set(confKey, v)
        case None => envConf.remove(confKey)
      }
      sc.removeSparkListener(listener)
    }
  }

  test("deterministic across partitionings of the input") {
    val a = TopKPerKey(sample.repartition(7), Seq(col("k")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    val b = TopKPerKey(sample.coalesce(1), Seq(col("k")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(a === b)
  }
}
