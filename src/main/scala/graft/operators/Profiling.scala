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

  /** Per-source dataset card: the one-glance corpus summary (doc count,
    * whitespace-token count, language spread, English share, length
    * profile) produced in ONE aggregation pass over the corpus —
    * `percentile` and the counting aggregates share the same shuffle on
    * `source`. The English share is an exact-integer IEEE division;
    * interpolated percentiles round to 4 dp (the engines' interpolation
    * arithmetic differs in the last ulp).
    */
  def datasetCard(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_chars"),
        round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("en_share",
        col("n_en").cast("double") / col("n_docs"))
      .orderBy(col("source"))
}
