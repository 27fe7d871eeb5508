package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth graph traversal over edge lists — the Pregel frontier
  * shape expressed as DataFrame joins: each hop is one equi-join shuffle
  * of the current frontier against the (cached) edge table, and the
  * visited set grows monotonically. Complements
  * [[ConnectedComponents]] (unbounded label propagation) with the
  * bounded-radius queries a lineage/contamination analysis needs
  * ("everything within k steps of these seeds").
  */
object Graph {

  /** Minimum-hop distances from a seed set, breadth-first, up to
    * `maxHops`. `edges` is `(src, dst)` and is treated as undirected;
    * `seeds` is a single `node` column.
    *
    * Scale shape: the symmetrized edge table is cached once and every
    * hop is a frontier⋈edges equi-join (shuffle on node id) followed by
    * an anti-join against the visited set — no iteration ever touches
    * more than (frontier × avg-degree) rows, and the visited set stays
    * hash-partitioned on `node` so the anti-join and the final
    * presentation reuse one exchange. The driver loop is bounded by the
    * constant `maxHops` (no convergence probe), so the plan is a fixed
    * unrolled pipeline of depth `maxHops` — lineage cannot run away.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 10,
      s"maxHops must be in [0, 10] (unrolled join depth), got $maxHops")
    // Symmetrize via one explode (a union would evaluate the upstream
    // edge plan twice in the same job — see ConnectedComponents.sym).
    val sym = edges
      .select(explode(array(
        struct(col("src").as("u"), col("dst").as("v")),
        struct(col("dst").as("u"), col("src").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .persist()

    var visited = seeds.select(col("node").cast("long").as("node"),
      lit(0).as("hops")).distinct().persist()
    var frontier = visited
    var k = 0
    while (k < maxHops) {
      k += 1
      val next = frontier
        .join(sym, col("node") === col("u"))
        .select(col("v").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hops", lit(k))
        .persist()
      val grown = visited.union(next).persist()
      // Materialize the new visited set so the next round's anti-join
      // reads the cache instead of re-running every prior hop; then the
      // stale generations can go.
      grown.count()
      visited.unpersist()
      frontier.unpersist()
      visited = grown
      frontier = next
    }
    sym.unpersist()
    visited
  }
}
