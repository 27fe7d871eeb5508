package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  * All reads go through here so pushdown/pruning behavior is uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events with `ts` normalized to the engine contract: nanos-since-epoch
    * Long. Integer arithmetic on both engines, no sub-micro truncation
    * mismatch vs DuckDB (`epoch_ns(ts)` works on any timestamp width).
    *
    * The fixture's physical type has drifted across driver generations —
    * TIMESTAMP(NANOS) (read as Long under the session's
    * `spark.sql.legacy.parquet.nanosAsLong`), then TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ) — so normalization is
    * type-driven here, in the ONE place every consumer reads through,
    * rather than assumed per-query. The session time zone is pinned UTC
    * ([[GraftSession]]), making the NTZ→TZ cast an identity on the
    * underlying micros value.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df // legacy nanos-as-long fixture: already on contract
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other")
    }
  }

  /** events with `ts` as a native timestamp column (wall-clock micros,
    * TIMESTAMP_NTZ) for the timestamp-native query forms
    * (`window()`, `session_window()`, `date_trunc`). Legacy nanos-Long
    * fixtures are lifted to NTZ (micros floor) so both loaders work on
    * either fixture generation.
    */
  def eventsTs(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case TimestampNTZType => df
      case TimestampType =>
        df.withColumn("ts", col("ts").cast(TimestampNTZType))
      case LongType =>
        // Integer FLOOR division: `div` truncates toward zero, which for
        // pre-epoch (negative) nanos rounds up by 1µs and diverges from
        // DuckDB's epoch_us/TIMESTAMP_NS flooring. Exact integer form (no
        // double roundoff at nano magnitudes).
        df.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000 + " +
            "(case when ts % 1000 < 0 then -1 else 0 end)) as timestamp_ntz)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other")
    }
  }
  /** events with `ts` UNTOUCHED — the physical column as the fixture
    * wrote it (Long nanos or TIMESTAMP(MICROS)). For time-sliced scans:
    * a range predicate on [[events]]' normalized `ts` is a derived-
    * column filter and cannot reach parquet row-group min/max stats;
    * filter HERE on the physical column (full pushdown), then normalize
    * the survivors (SCALING.md "Time-sliced scans"). */
  def eventsRaw(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
