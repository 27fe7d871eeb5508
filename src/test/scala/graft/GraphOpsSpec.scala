package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Multimodal, Sampling, TextAnalysis}

/** Round-5 operators: bounded-depth BFS, PII redaction, capped source
  * interleaving, and frame scene-cut detection. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bfsHops: min hops on a path graph, radius-bounded") {
    // 1-2-3-4-5 path, seed {1}: hops = node distance; 5 is 4 hops out
    // and must be absent at maxHops=3.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsHops: undirected traversal, multiple seeds, min over seeds") {
    // Edges stored one direction only; traversal must go both ways.
    // Node 3 is 1 hop from seed 4 and 2 from seed 1 — BFS keeps 1.
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1))
  }

  test("bfsHops: disconnected components stay unreached") {
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1))
  }

  test("pagerank: fixed-point micro-ranks match the hand computation") {
    // 1→2, 1→3, 2→3, 3→1; N=3, scale 10^12. One damped round:
    //   r0 = 10^12 div 3 = 333333333333 each
    //   contribs: 1 halves its rank to 2 and 3; 2 and 3 pass whole.
    //   r1(x) = 150000000000 div 3 + (85 * s(x)) div 100
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, iterations = 1)
      .as[(Long, Long)].collect().toMap
    val base = 150000000000L / 3
    assert(got === Map(
      1L -> (base + 85L * 333333333333L / 100),                    // from 3
      2L -> (base + 85L * (333333333333L / 2) / 100),              // from 1
      3L -> (base + 85L * (333333333333L / 2 + 333333333333L) / 100)))
    // Mass is conserved up to the documented floor-division leak.
    val mass = got.values.sum
    assert(mass <= 1000000000000L && mass > 999999999990L)
  }

  test("pagerank: a sink node receives only the teleport base") {
    // 1→2 only: node 2 never contributes back, so after 2 rounds node 1
    // holds exactly the base; dedup of duplicate edge rows is implied.
    val edges = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, iterations = 2)
      .as[(Long, Long)].collect().toMap
    val base = 150000000000L / 2
    assert(got(1L) === base)
    assert(got(2L) === base + 85L * base / 100)
  }

  test("pagerankDangling: redistributes sink mass and conserves total") {
    // 1→2 only: node 2 is dangling. One round, N=2:
    //   r0 = 500000000000 each; dm = r0(2) = 500000000000
    //   share = dm div 2 = 250000000000
    //   r1(1) = 75*10^9 + (85 * (0 + 250000000000)) div 100
    //   r1(2) = 75*10^9 + (85 * (500000000000 + 250000000000)) div 100
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pagerankDangling(edges, iterations = 1)
      .as[(Long, Long)].collect().toMap
    val base = 150000000000L / 2
    assert(got(1L) === base + 85L * 250000000000L / 100)
    assert(got(2L) === base + 85L * (500000000000L + 250000000000L) / 100)
    // Mass conservation is the point of the variant: total stays at
    // scale within the documented integer-floor leak (≤1 micro-rank per
    // node/edge per round) — where plain pagerank loses the whole
    // dangling share (~42.5% here).
    assert(got.values.sum > 1000000000000L - 10 &&
      got.values.sum <= 1000000000000L)
    val plain = Graph.pagerank(edges, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(plain.values.sum < 800000000000L,
      "plain variant must actually lose the dangling mass here")
  }

  test("pagerankDangling: no dangling nodes => identical to plain pagerank") {
    // Every node has an out-edge (cycle + chord): dm = 0 each round, so
    // the two semantics must coincide bit-for-bit.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val a = Graph.pagerank(edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pagerankDangling(edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("redactPii: counts and global replacement") {
    val docs = Seq(
      (1L, "mail bob.1@example.com and sue@test.org or call 555-1234"),
      (2L, "no pii here"),
      (3L, "twice 111-2222 and 333-4444")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs).orderBy("doc_id")
      .select("doc_id", "n_email", "n_phone").as[(Long, Long, Long)]
      .collect()
    assert(got === Array((1L, 2L, 1L), (2L, 0L, 0L), (3L, 0L, 2L)))
    // The md5 is of the fully-redacted body: recompute via Spark's own
    // md5 on the expected literal and compare.
    val gotMd5 = TextAnalysis.redactPii(docs).filter($"doc_id" === 1)
      .select("redacted_md5").as[String].head()
    val expMd5 = Seq("mail <EMAIL> and <EMAIL> or call <PHONE>").toDF("t")
      .select(md5($"t".cast("binary"))).as[String].head()
    assert(gotMd5 === expMd5)
  }

  test("interleaveSources: arithmetic mix_pos equals the global row_number") {
    // Uneven sources (5/3/1 docs, cap 4) — the capped quota and the
    // source-exhaustion transition both exercise the offset arithmetic.
    val docs = (1L to 5L).map(i => (i, s"alpha doc $i", "s1")) ++
      (6L to 8L).map(i => (i, s"beta doc $i", "s2")) ++
      Seq((9L, "gamma doc", "s3"))
    val df = docs.toDF("doc_id", "text", "source")
    val got = Sampling.interleaveSources(df, cap = 4)
    // Oracle semantics, driver-side: rank within source by (md5, id),
    // global order by (rank, source).
    val ranked = got.select("doc_id", "source", "r", "mix_pos")
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
    assert(ranked.length === 8) // 4 + 3 + 1
    // positions are exactly 0..7 with no gaps
    assert(ranked.map(_._4).toSeq === (0L to 7L))
    // global order is rank-major, source-minor
    val pairs = ranked.map(t => (t._3, t._2)).toSeq
    assert(pairs === pairs.sorted)
    // round-robin head: rank-1 docs of all three sources come first
    assert(ranked.take(3).map(_._2).toSet === Set("s1", "s2", "s3"))
  }

  test("sceneCuts: jump threshold splits scenes, first frame opens scene 0") {
    // Frames crafted via payloads whose 64-byte frames alternate lead
    // chars 'a' (97) and 'z' (122): |sig jump| = 25*256 = 6400 > 1500
    // at every sampled-frame boundary.
    val text = ("a" * 128) + ("z" * 128) + ("a" * 128) // frames 0,2,4 sampled
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.asBinaryPayloads(docs), 64, 2)
    val got = Multimodal.sceneCuts(frames, threshold = 1500)
      .orderBy("frame_no")
      .select("frame_no", "is_cut", "scene_id")
      .as[(Long, Boolean, Int)].collect()
    assert(got === Array((0L, false, 0), (2L, true, 1), (4L, true, 2)))
  }

  test("sceneCuts: steady stream is a single scene") {
    val docs = Seq((1L, "m" * 300)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.asBinaryPayloads(docs), 64, 2)
    val got = Multimodal.sceneCuts(frames, threshold = 1500)
      .select("is_cut", "scene_id").as[(Boolean, Int)].collect()
    assert(got.forall(r => !r._1 && r._2 === 0))
  }

  test("labelPropagation: cliques converge to min-id communities; a " +
      "bridge node follows its heavier side") {
    import graft.operators.Graph
    // Two cliques {1,2,3} and {10,11,12}; node 20 bridges to BOTH
    // members of clique A's {2,3} but only one of B's. Round 1: inside
    // a clique every label (incl. self-vote) ties at count 1, so the
    // smallest clique id wins everywhere in it; round 2 is stable for
    // clique members.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 2L), (20L, 3L), (20L, 10L))
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(labels(_) == 1L),
      s"clique A must converge to min id 1: $labels")
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L),
      s"clique B must converge to min id 10: $labels")
    // Round 2: node 20's votes are {label(2)=1, label(3)=1,
    // label(10)=10, self}: the doubled clique-A side wins.
    assert(labels(20L) == 1L,
      s"bridge must follow its heavier side: $labels")
    // Determinism: a second evaluation is bit-identical.
    val again = Graph.labelPropagation(edges, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(labels == again)
  }

  test("kCore: a pendant chain peels one node per round into the " +
      "clique core — the cascade is DERIVED from the geometry") {
    // K4 on {10,11,12,13} (a 3-core) with chain 1-2-3 hung off node
    // 10. k=2: round 1 peels only node 1 (deg 1); node 2's degree
    // only then drops to 1, so round 2 peels node 2; round 3 peels
    // node 3. Each round's casualty is forced by the previous one —
    // a peel that recounted degrees on the ORIGINAL graph (the
    // classic bug) would stop after node 1.
    val k4 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 10L))
    val edges = (k4 ++ chain).toDF("src", "dst")
    def core(rounds: Int): Map[Long, Long] =
      Graph.kCore(edges, k = 2, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    assert(core(1).keySet === Set(2L, 3L, 10L, 11L, 12L, 13L))
    assert(core(2).keySet === Set(3L, 10L, 11L, 12L, 13L))
    assert(core(3) === Map(10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L),
      "after 3 rounds only the K4 survives, every member at degree 3")
    // Fixpoint: a 4th round changes nothing once the chain is gone.
    assert(core(4) === core(3))
  }

  test("kCore: the gated corpus (k=5, part co-occurrence) converges " +
      "inside 3 rounds — round 4 is a fixpoint, so the query output " +
      "IS the 5-core") {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      .distinct()
    val r3 = Graph.kCore(edges, k = 5, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val r4 = Graph.kCore(edges, k = 5, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r3.nonEmpty)
    assert(r3 === r4,
      "corpus no longer converges in 3 peels — bump the query's " +
        "rounds or re-derive the (k, rounds) pair")
    // The peel must actually bind: the core is a strict subset of the
    // graph's node set. (The multi-ROUND cascade is pinned by the
    // geometry-derived chain fixture above — at this spec's small SF
    // the corpus' round-2+ casualties already hold zero surviving
    // edges, so round 1's output coincides with round 3's.)
    val n0 = edges.select(col("src").as("n"))
      .unionByName(edges.select(col("dst").as("n")))
      .distinct().count()
    assert(r3.size < n0,
      "the 5-core equals the whole graph — k no longer binds")
  }

  test("kCoreSalted: bit-identical to the unsalted peel, and the " +
      "degree aggregation really runs two-phase") {
    // The 100 TB hub-skew adaptation: every degree count partials on
    // (u, xxhash64(v) mod salts) before merging on u. Integer partial
    // sums merge exactly — parity must hold on ANY graph, pinned here
    // on both the geometry fixture and the gated corpus graph.
    val k4 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 10L))
    val fixture = (k4 ++ chain).toDF("src", "dst")
    assert(
      Graph.kCoreSalted(fixture, k = 2, rounds = 3, salts = 8)
        .as[(Long, Long)].collect().toMap ===
        Graph.kCore(fixture, k = 2, rounds = 3)
          .as[(Long, Long)].collect().toMap,
      "salted peel diverged on the geometry fixture")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      .distinct()
    val salted = Graph.kCoreSalted(edges, k = 5, rounds = 3, salts = 8)
    assert(
      salted.as[(Long, Long)].collect().toMap ===
        Graph.kCore(edges, k = 5, rounds = 3)
          .as[(Long, Long)].collect().toMap,
      "salted peel diverged on the corpus graph")
    // Plan shape: the salt key must actually reach the aggregation —
    // one partial-count alias (`_pc`) per peel round plus the output
    // degree agg = 4 in the analyzed plan's FIRST lineage print;
    // like the kcore degree-alias pin, re-prints under the semi-join
    // subtrees inflate the raw count, so pin presence + per-round
    // salt keys via the `_salt` alias instead of an exact count.
    val plan = salted.queryExecution.analyzed.toString
    assert(" AS _pc".r.findAllIn(plan).nonEmpty &&
      " AS _salt".r.findAllIn(plan).nonEmpty,
      "salted two-phase aggregation missing from the plan")
    // And the unsalted plan must NOT carry the salt machinery — the
    // default path's shape is unchanged.
    val plain = Graph.kCore(edges, k = 5, rounds = 3)
      .queryExecution.analyzed.toString
    assert(!plain.contains(" AS _salt"),
      "unsalted kCore unexpectedly grew the salt key")
  }
}
