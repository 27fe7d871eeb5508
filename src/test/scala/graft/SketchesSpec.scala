package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Profiling, Sketches}

/** Contracts for the sketch / maintenance / link-prediction operators
  * added alongside the profiling family: KMV's estimate quality and
  * exact-small-group fallback, count-min's one-sided error and bounded
  * sketch size, the compaction planner's partition-exactness and
  * bin-boundary invariants, and the common-neighbor hub cap.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV: exact below k, estimate within 30% at k=32 on 1000 keys") {
    val small = (1 to 10).map(i => (s"v$i", "small")).toDF("key", "grp")
    val exact = Sketches.kmvDistinct(small, col("key"), col("grp"), k = 32)
      .collect().head
    assert(exact.getAs[Long]("n_kept") == 10L &&
      exact.getAs[Long]("est_distinct") == 10L,
      "group with < k distinct keys must report exactly")

    // 1000 distinct keys, each duplicated 3x (distinct-agg must dedup).
    val big = (1 to 1000).flatMap(i => Seq.fill(3)((s"key$i", "big")))
      .toDF("key", "grp")
    val est = Sketches.kmvDistinct(big, col("key"), col("grp"), k = 32)
      .collect().head.getAs[Long]("est_distinct")
    // KMV stderr is ~1/sqrt(k-2) ≈ 18% at k=32; md5 is fixed so this
    // is a deterministic pin of the actual estimate, not a flaky bound.
    assert(est > 700 && est < 1300,
      s"KMV estimate $est implausible for true cardinality 1000")
  }

  test("CMS: one-sided error (est >= true) and d*w sketch size") {
    val df = (1 to 2000).map(i => s"k${i % 50}").toDF("key")
    val sketch = Sketches.cmsBuild(df, col("key"), depth = 3, width = 64)
    assert(sketch.count() <= 3L * 64,
      "sketch must be at most d*w cells regardless of input size")
    val hh = Sketches.cmsHeavyHitters(df, col("key"), depth = 3,
      width = 64, minCount = 1L).collect()
    assert(hh.length == 50)
    hh.foreach { r =>
      assert(r.getAs[Long]("est_c") >= r.getAs[Long]("true_c"),
        s"count-min must never underestimate: $r")
    }
    // 50 keys in 64 buckets: at least one key must be collision-free
    // in some row and estimate exactly.
    assert(hh.exists(r =>
      r.getAs[Long]("est_c") == r.getAs[Long]("true_c")))
  }

  test("sharded KMV and CMS are bit-identical to their monolithic twins") {
    val docs = Tables.documents(spark, sfDir)
    val mono = operators.Sketches
      .kmvDistinct(docs, col("text"), col("source"), k = 16)
    val sharded = operators.Sketches
      .kmvDistinctSharded(docs, col("text"), col("source"),
        col("doc_id") % 4, k = 16)
    assert(mono.exceptAll(sharded).isEmpty &&
      sharded.exceptAll(mono).isEmpty,
      "KMV shard-merge must reproduce the monolithic synopsis exactly")

    val ev = Tables.events(spark, sfDir)
    val cmsM = operators.Sketches
      .cmsHeavyHitters(ev, col("user_id"), 3, 64, minCount = 1L)
    val cmsS = operators.Sketches
      .cmsHeavyHittersSharded(ev, col("user_id"), col("event_id") % 4,
        nShards = 4, depth = 3, width = 64, minCount = 1L)
    assert(cmsM.exceptAll(cmsS).isEmpty && cmsS.exceptAll(cmsM).isEmpty,
      "CMS linearity: cell-wise shard merge must equal one-pass build")
  }

  test("kmvJaccard: exact when the union fits in the synopsis") {
    val a = (1 to 30).map(i => s"k$i").toDF("key")
    val b = (21 to 50).map(i => s"k$i").toDF("key")
    // |A|=30, |B|=30, inter=10, union=50 < k=64 -> everything exact.
    val r = operators.Sketches
      .kmvJaccard(a, col("key"), b, col("key"), k = 64).collect().head
    assert(r.getAs[Long]("n_kept") == 50L)
    assert(r.getAs[Long]("n_both") == 10L)
    assert(r.getAs[Long]("jac_micro") == 10L * 1000000 / 50)
    assert(r.getAs[Long]("est_union") == 50L)
    assert(r.getAs[Long]("est_inter") == 10L)
  }

  test("HLL: register estimate within 35% on 1000 distinct keys") {
    val df = (1 to 1000).flatMap(i => Seq.fill(2)((s"key$i", "g")))
      .toDF("key", "grp")
    val r = operators.Sketches
      .hllDistinct(df, col("key"), col("grp")).collect().head
    val est = r.getAs[Double]("est_hll")
    // m=64 -> ~13% stderr; md5 is fixed, so this pins a deterministic
    // value, not a flaky draw.
    assert(est > 650 && est < 1350, s"HLL estimate $est for true 1000")
    // And the small-range branch: 5 distinct keys -> linear counting
    // territory, estimate must land near 5.
    val small = (1 to 5).map(i => (s"v$i", "g")).toDF("key", "grp")
    val es = operators.Sketches
      .hllDistinct(small, col("key"), col("grp")).collect()
      .head.getAs[Double]("est_hll")
    assert(es > 3.0 && es < 8.0, s"linear-counting estimate $es for 5")
  }

  test("compaction plan: partitions files exactly, bins respect target") {
    val target = 100L
    val files = Seq(
      // part "a": steady 40-byte files -> bins of ceil(100/40)=3 files
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), ("a", 4L, 40L),
      ("a", 5L, 40L), ("a", 6L, 40L), ("a", 7L, 40L),
      // part "b": an oversized file spans multiple bin widths
      ("b", 1L, 10L), ("b", 2L, 350L), ("b", 3L, 10L), ("b", 4L, 10L))
      .toDF("part_key", "file_id", "bytes")
    val plan = Profiling.compactionPlan(files, target)
      .orderBy("part_key", "bin").collect()

    // Exactness: every file lands in exactly one bin.
    assert(plan.map(_.getAs[Long]("n_files")).sum == 11)
    assert(plan.map(_.getAs[Long]("bin_bytes")).sum == 7 * 40 + 380)

    // Bins within a partition cover disjoint, ordered file-id ranges.
    plan.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("last_file") < y.getAs[Long]("first_file"))
        case _ =>
      }
      // Every non-final bin closed because the running total crossed
      // the NEXT present bin's boundary (bins can be skipped only by a
      // file larger than the bin width).
      var cum = 0L
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          cum += x.getAs[Long]("bin_bytes")
          assert(cum >= y.getAs[Long]("bin") * target,
            s"bin ${x.getAs[Long]("bin")} closed early: cum=$cum")
        case _ =>
      }
    }
    // The oversized file closes its bin across several bin widths:
    // part b packs as bin 0 = files {1, 2} (360 B, crossing boundaries
    // 100..300) and the next file re-opens at bin 360//100 = 3 — bin
    // ids are byte offsets div target, monotone but not dense.
    val bBins = plan.filter(_.getString(0) == "b")
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_files"),
        r.getAs[Long]("bin_bytes"))).toSeq
    assert(bBins == Seq((0L, 2L, 360L), (3L, 2L, 20L)), bBins.toString)
  }

  test("commonNeighbors: hub cap bounds pair work, degrees stay global") {
    // 4 left nodes all share hub part 99 (degree 4 > cap 3); nodes 1,2
    // additionally share parts 1 and 2 (degree 2 each, under cap).
    val edges = Seq(
      (1L, 99L), (2L, 99L), (3L, 99L), (4L, 99L),
      (1L, 1L), (2L, 1L), (1L, 2L), (2L, 2L))
      .toDF("src", "dst")
    val out = Graph.commonNeighbors(edges, degreeCap = 3, minShared = 2L)
      .collect()
    // Only the (1,2) pair survives: the hub is excluded from pair
    // generation, so pairs that co-occur ONLY at the hub never form.
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("shared") == 2L)
    // Jaccard denominator uses FULL degrees (3 each, hub included):
    // 2*1e6 div (3+3-2) = 500000 — the cap bounds work, not the score.
    assert(r.getAs[Long]("jac_micro") == 500000L)
  }
}
