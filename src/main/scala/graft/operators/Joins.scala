package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skew at scale. Spark's AQE skew-join handles most
  * cases (`spark.sql.adaptive.skewJoin.enabled`); manual salting remains
  * the tool when one key dominates a shuffle join so badly that a single
  * task would own it (e.g. a flow-log fleet where one ENI emits 30% of
  * traffic), or when AQE is unavailable (streaming micro-batches).
  */
object Joins {

  /** Skew-resistant inner equi-join of a large skewed frame against a
    * small frame: the large side's hot keys are spread across `salt`
    * subkeys round-robin; the small side is replicated `salt`× so every
    * subkey finds its match. Result is exactly `large ⋈ small` on `key`,
    * but the shuffle distributes each hot key over `salt` tasks.
    * Replication cost: `salt × |small|` rows — keep the small side small
    * (it is broadcast-sized anyway in most salting scenarios where a
    * broadcast join is impossible, e.g. the small side exceeds driver
    * memory but not executor memory).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    // Deterministic per-row salt: hash the whole row rather than
    // monotonically_increasing_id() (which varies across task retries and
    // repartitionings — unsafe under non-idempotent downstream sinks) and
    // rather than the key alone (which would map a hot key to a single
    // salt bucket and defeat the spreading). Fully identical duplicate
    // rows share a bucket; distinct rows of a hot key spread uniformly.
    val salted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*),
        lit(salt.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
