package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality/frequency sketches, expressed relationally so
  * every stage map-side-combines and the sketch itself — not the data —
  * is what crosses the shuffle. These are the 100 TB profiling
  * primitives: a KMV synopsis answers "how many distinct urls per
  * crawl?" from k rows per group, and a count-min sketch answers "how
  * often does this key appear?" from a d×w table that is broadcast-
  * joinable against any candidate set, no matter how large the stream
  * that built it was.
  *
  * Determinism contract (same discipline as [[Dedup]]'s v2 family):
  * all hashing is md5-prefix → 48-bit integer, all estimates are exact
  * integer arithmetic (`div`), so results are bit-identical across
  * engines, partitionings, and retries — the property that lets the
  * DuckDB oracle gate them value-for-value.
  */
object Sketches {

  /** 48-bit uniform hash of a (stringified) column: the md5-prefix
    * idiom shared with pipeline_checksum / the v2 dedup family. */
  private def h48(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("bigint")

  /** K-minimum-values distinct-count estimate per group.
    *
    * The KMV synopsis of a set is its k smallest (distinct) hash
    * values; with hashes uniform on [0, 2^48), the k-th smallest value
    * h_k estimates the cardinality as (k−1) · 2^48 / h_k. Groups with
    * fewer than k distinct values report exactly (the synopsis IS the
    * set). Estimates use integer `div` — no doubles anywhere.
    *
    * Scale shape: one distinct-aggregate on (group, hash) — map-side
    * partial distinct does the heavy lifting — then a per-group sort of
    * AT MOST the distinct-hash count, cut to k rows by rank. At 100 TB
    * the synopsis (k rows per group) is all that survives; synopses
    * from disjoint shards union and re-rank to merge, which is how the
    * sharded-bloom / sharded-BM25 paths in this repo already combine
    * per-shard state. The final per-group row is k integers wide,
    * independent of data volume.
    *
    * Output: (group, n_kept, est_distinct) — `n_kept` = min(k, true
    * distinct), `est_distinct` = exact count when the group fits in the
    * synopsis, else the KMV estimate.
    */
  def kmvDistinct(df: DataFrame, key: Column, group: Column,
      k: Int = 32): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df.select(group.as("grp"), h48(key).as("h")).distinct()
    val ranked = hashed.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rnk") <= k)
    ranked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("grp"), col("n_kept"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div hk"))
          .as("est_distinct"))
  }

  /** Count-min sketch: build the d×w counter table in one pass.
    *
    * Each row increments d counters, one per hash family
    * (Kirsch–Mitzenmacher-style independent rows via a salted md5).
    * The sketch is `d·w` rows total — a constant — so it broadcasts;
    * building it is a single aggregation whose map-side partials are
    * already sketches (count-min is linear), which is exactly why the
    * structure survives any partitioning or shard-merge at 100 TB.
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int = 3,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 16,
      s"unreasonable CMS shape d=$depth w=$width")
    df.select(key.cast("string").as("k"))
      .select(explode(array((1 to depth).map(j =>
        struct(lit(j).as("j"),
          (h48(concat(lit(s"$j:"), col("k"))) % width).as("bucket"))): _*))
        .as("cell"))
      .select(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Heavy-hitter estimates: candidate keys scored against a broadcast
    * count-min sketch, with the true count alongside so the one-sided
    * error (est ≥ true, inflated only by collisions) is visible.
    *
    * Scale shape: the sketch is d×w rows (broadcast); each candidate
    * expands to its d cells and min-reduces after a broadcast equi-join
    * — candidates stream through map-side, nothing shuffles but the
    * candidate aggregate itself. At 100 TB the candidate set comes from
    * a cheap prior (a per-shard top-N, a previous day's heavy list);
    * here it is the keys at/above `minCount` so the oracle can rebuild
    * it exactly.
    */
  def cmsHeavyHitters(df: DataFrame, key: Column, depth: Int = 3,
      width: Int = 256, minCount: Long = 100L): DataFrame = {
    val sketch = cmsBuild(df, key, depth, width)
    val candidates = df.select(key.cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("true_c"))
      .filter(col("true_c") >= minCount)
    candidates
      .select(col("k"), col("true_c"), explode(array((1 to depth).map(j =>
        struct(lit(j).as("j"),
          (h48(concat(lit(s"$j:"), col("k"))) % width).as("bucket"))): _*))
        .as("cell"))
      .select(col("k"), col("true_c"), col("cell.j").as("j"),
        col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("k"), col("true_c"))
      .agg(min(col("c")).as("est_c"))
  }
}
