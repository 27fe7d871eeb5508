package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: pre-hash-partitioning fact tables on their
  * join key at write time so repeated joins/aggregations on that key run
  * with NO exchange at read time. At 100 TB this is the difference
  * between shuffling the fact table per query and shuffling it once at
  * ingest: a lineitem⋈orders on orderkey over bucketed tables is a
  * zip-like local join per bucket.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table (parquet). Bucket count
    * should be sized so bucket × column-chunk fits executor memory at
    * target scale. With `path` set the table is EXTERNAL at that
    * location — re-registerable by a fresh session over the same
    * files; without it the table is managed, whose warehouse location
    * outlives an in-memory catalog and collides on the next JVM
    * (LOCATION_ALREADY_EXISTS) — so repeatable enumerations must pass
    * a scratch path. The name is dropped first either way so a
    * leftover registration from another session cannot block the
    * overwrite. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket
    * count: Catalyst recognizes the co-partitioning and plans a
    * sort-merge join with zero Exchange. */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
