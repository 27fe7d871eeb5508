package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus/key profiling operators — the diagnostics a pipeline operator
  * runs BEFORE choosing a physical strategy at 100 TB: key-skew
  * profiling decides whether a join needs salting (Joins.saltedJoin)
  * or AQE skew splitting, and the per-source dataset card is the
  * standard corpus summary that gates a training-data drop.
  *
  * Scale design: both are single-pass aggregations on the natural key
  * (map-side partial aggregation does the heavy lifting), followed by a
  * broadcast of a one-row/`topN`-row side — no full-table second pass,
  * no driver collect.
  */
object Profiling {

  /** Content-hash diff between two corpus snapshots — the ingest-delta
    * accounting an incremental pipeline runs on every refresh: which
    * documents were added, removed, modified (same id, different
    * bytes), or untouched. One full-outer hash join on the id; text
    * never crosses the shuffle (md5 projects map-side), so the cost is
    * id+hash width at any corpus size. Downstream, `added ∪ modified`
    * is exactly the re-process set (re-index, re-embed, re-dedup) and
    * `removed` the retraction set — the same contract as the index
    * append/shard paths' "index only the new batch". */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    oldSnap.select(col("doc_id"), md5(col("text")).as("h_old"))
      .join(newSnap.select(col("doc_id"), md5(col("text")).as("h_new")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("modified").as("status"))

  /** Population Stability Index per source against the whole corpus —
    * the standard drift monitor a training pipeline runs on every
    * refresh ("did this crawl's length distribution move?"). Documents
    * bin by `value div binWidth` capped at `bins-1`; each source's
    * binned share p compares against the corpus share q via
    * PSI = Σ (p−q)·ln(p/q). PSI < 0.1 is conventionally stable,
    * > 0.25 action-worthy.
    *
    * Determinism: shares are Laplace-smoothed ((c+1)/(tot+bins), so
    * ln never sees 0) and computed as IEEE doubles from exact integer
    * counts; each of the `bins` terms rounds to 6 dp and sums as exact
    * decimal. Scale shape: one (source, bin) aggregate with map-side
    * combine (the only pass over the data), then arithmetic on
    * |sources|×bins rows; the dense bin frame comes from an explode of
    * the per-source totals, and the corpus totals ride in as a
    * broadcast one-row cross join — no collect, nothing quadratic. */
  def driftPsi(docs: DataFrame, value: Column = col("n_chars"),
      binWidth: Int = 200, bins: Int = 10): DataFrame = {
    val binned = docs.filter(value.isNotNull)
      .select(col("source"), value.cast("long").as("v"))
      // integer `div`, not double-divide-then-cast (bucket-boundary rule)
      .select(col("source"),
        least(lit((bins - 1).toLong), expr(s"v div $binWidth")).as("bin"))
    val perSrc = binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val srcTot = perSrc.groupBy(col("source")).agg(sum(col("c")).as("tot"))
    val globBin = perSrc.groupBy(col("bin")).agg(sum(col("c")).as("gc"))
    val globTot = globBin.agg(sum(col("gc")).as("gt"))
    val dense = srcTot.withColumn("bin",
      explode(array((0 until bins).map(b => lit(b.toLong)): _*)))
    val p = (col("c") + 1).cast("double") / (col("tot") + bins)
    val q = (col("gc") + 1).cast("double") / (col("gt") + bins)
    dense
      .join(perSrc, Seq("source", "bin"), "left")
      .join(globBin, Seq("bin"), "left")
      .crossJoin(broadcast(globTot))
      .na.fill(0L, Seq("c", "gc"))
      .select(col("source"), col("tot"),
        round((p - q) * log(p / q), 6).cast("decimal(18,6)").as("term"))
      .groupBy(col("source"))
      .agg(max(col("tot")).as("n_docs"),
        sum(col("term")).cast("double").as("psi"))
  }

  /** Per-key frequency profile: the `topN` heaviest keys with their
    * counts and skew ratio (count ÷ mean count per key). A ratio ≫ 1
    * on the head key is the signal to salt that join key or lean on
    * AQE's skew-join splitting; ~1 everywhere means plain hash
    * partitioning is safe.
    *
    * The ratio is emitted as one IEEE division of two exact integers
    * (`cnt * n_keys / total`) — deterministic across engines, no
    * rounding of an exact rational (the q_tpch_q2 drift class).
    * Aggregate once on the key, then cross-join the one-row global
    * stats (broadcast) — the profile never re-scans the input.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        ((col("cnt") * col("n_keys")).cast("double") / col("total"))
          .as("skew_ratio"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }

  /** Exact interpolated percentiles per key with BOUNDED state — the
    * scale-safe replacement for `percentile()`, whose aggregation
    * buffer holds every value of the group (a 10^9-row group OOMs the
    * task). Here state is the VALUE DISTRIBUTION: count per (key,
    * value), cumulative counts by value order, then the two covering
    * values of each interpolated rank position `1 + p·(n-1)` are picked
    * by flag-and-max aggregation. Memory tracks distinct values per
    * key (for length-like columns: thousands), never row count. Same
    * definition as Spark `percentile` / DuckDB `quantile_cont`.
    */
  def groupedPercentiles(df: DataFrame, key: Column, value: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("k")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("k"))
    val cum = df.select(key.as("k"), value.cast("double").as("v"))
      // built-in percentile() ignores nulls; count only real values so
      // rank positions agree on data with missing entries
      .filter(col("v").isNotNull)
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("prev", col("cum") - col("cnt"))
    val flagged = ps.foldLeft(cum) { case (acc, (p, name)) =>
      val pos = lit(1.0) + lit(p) * (col("n") - 1).cast("double")
      acc
        .withColumn(s"${name}_lo",
          when(col("prev") < floor(pos) && floor(pos) <= col("cum"), col("v")))
        .withColumn(s"${name}_hi",
          when(col("prev") < ceil(pos) && ceil(pos) <= col("cum"), col("v")))
        .withColumn(s"${name}_frac", pos - floor(pos))
    }
    val aggs = ps.flatMap { case (_, name) =>
      Seq(max(col(s"${name}_lo")).as(s"${name}_lo"),
        max(col(s"${name}_hi")).as(s"${name}_hi"),
        max(col(s"${name}_frac")).as(s"${name}_frac"))
    }
    val picked = flagged.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    ps.foldLeft(picked) { case (acc, (_, name)) =>
      acc.withColumn(name,
        col(s"${name}_lo") +
          col(s"${name}_frac") * (col(s"${name}_hi") - col(s"${name}_lo")))
        .drop(s"${name}_lo", s"${name}_hi", s"${name}_frac")
    }
  }

  /** Compaction plan: pack small files into `targetBytes` output bins,
    * next-fit in file order within each table partition — the
    * small-file maintenance pass every 100 TB lakehouse runs (a day of
    * streaming ingest leaves thousands of KB-scale parquet files whose
    * per-file open/footer cost dominates scans; OPTIMIZE rewrites them
    * into ~128 MB objects).
    *
    * Bin assignment is pure window arithmetic: the running byte total
    * BEFORE each file, integer-divided by the target, is the file's
    * bin (next-fit packing — deterministic given the file order, no
    * driver loop, no bin state). One shuffle on the partition key and
    * one sort — the same exchange a per-partition rewrite would need
    * anyway — and the emitted PLAN is |bins| rows, not |files|.
    * First-fit-decreasing would pack ~10% tighter but needs
    * size-ordered iteration with mutable bin state (a sequential scan);
    * next-fit in deterministic file order keeps the plan a pure window
    * function, which is the right trade at fleet scale.
    *
    * `files` is `(part_key, file_id, bytes)`; an oversized file (≥
    * target) closes its bin past several bin widths, so the following
    * file opens a LATER bin index — bin ids are byte offsets div
    * target, monotone but not dense. Output: one row per (part_key,
    * bin) with file count, byte total, and the id range it covers.
    */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("part_key")).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .select(col("part_key"), col("file_id"),
        col("bytes").cast("long").as("bytes"))
      .withColumn("before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"before div ${targetBytes}L"))
      .groupBy(col("part_key"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
  }

  /** Per-source dataset card: the one-glance corpus summary (doc count,
    * whitespace-token count, language spread, English share, length
    * profile). Counting aggregates are one partial-aggregated pass;
    * length percentiles come from [[groupedPercentiles]] (bounded
    * state — a plain `percentile()` buffers every group value, which
    * does not survive a 10^9-doc source). The English share is an
    * exact-integer IEEE division; percentiles round to 4 dp (the
    * engines' interpolation arithmetic differs in the last ulp).
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        max(col("n_chars")).as("max_chars"))
    val pcts = groupedPercentiles(docs, col("source"), col("n_chars"),
      Seq(0.5 -> "p50_chars", 0.9 -> "p90_chars"))
      .withColumnRenamed("k", "source")
      .select(col("source"),
        round(col("p50_chars"), 4).as("p50_chars"),
        round(col("p90_chars"), 4).as("p90_chars"))
    // left join: a source whose n_chars are all NULL has no percentile
    // rows, but must stay on the card (NULL p50/p90) — an inner join
    // would silently drop it, diverging from quantile_cont's NULL-keep
    base.join(pcts, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_langs"), col("n_en"), col("p50_chars"), col("p90_chars"),
        col("max_chars"),
        (col("n_en").cast("double") / col("n_docs")).as("en_share"))
      .orderBy(col("source"))
  }
}
