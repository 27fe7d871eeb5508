package graft

import org.apache.spark.sql.SparkSession

/** One place to construct the engine's SparkSession so every entry point
  * (Bench, Verify, Explain, tests) runs with identical semantics:
  *
  *  - UTC session time zone (oracle comparability);
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` set at construction —
  *    legacy events.parquet fixtures carry TIMESTAMP(NANOS), which Spark
  *    reads as a nanos-epoch Long under this flag (current fixtures are
  *    TIMESTAMP(MICROS) and unaffected; [[Tables.events]] normalizes
  *    either to the nanos-Long contract). Setting it here (not inside a
  *    table loader) keeps session behavior order-independent;
  *  - shuffle partitions sized to the local core count, not the 200
  *    default (local[32] harness; a real cluster would size this to
  *    2-3× total executor cores);
  *  - AQE on: runtime coalescing/skew-join handling is part of the
  *    100 TB design (SURVEY.md §7).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE coalesce the output partitioning of cached plans too
      // (default false): iterative operators persist small intermediate
      // tables (connected components' label rounds) and would otherwise
      // re-iterate on shuffle.partitions near-empty partitions.
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // Custom expressions + the TopKPerKey planner strategy
      // (graft.plans) ride in at session construction.
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
