package graft

import org.apache.spark.sql.DataFrame

/** The SQL text surface (Catalog.registerViews + spark.sql) and the
  * Column API resolve to the same results: a Spark-SQL re-statement of
  * representative queries must match the SparkEntry implementation
  * row-for-row. (The DuckDB oracle gate proves cross-engine agreement;
  * this proves intra-engine API parity.)
  */
class SqlParitySpec extends SparkSpec {

  private lazy val ready: Unit = Catalog.registerViews(spark, sfDir)

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString("|"))

  private def check(name: String, sql: String): Unit = {
    ready
    val api = rows(SparkEntry.queries(name)(spark, sfDir))
    val viaSql = rows(spark.sql(sql))
    assert(api === viaSql, s"$name: SQL text surface diverges from Column API")
  }

  test("q_join3_revenue parity") {
    check("q_join3_revenue",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  test("q_semi_join parity") {
    check("q_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin)
  }

  test("q_latest_per_key parity") {
    check("q_latest_per_key",
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)
  }

  test("q_histogram parity") {
    check("q_histogram",
      """SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin)
  }

  test("q_approx_distinct stays within HLL error bounds of exact counts") {
    // The query itself now carries the accuracy contract: exact counts
    // (oracle-gated) plus booleans asserting the HLL estimate is within
    // 5x the default rsd (0.05) of exact — a generous non-flaky bound.
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getBoolean(3), s"${r.getString(0)} parts out of bound")
      assert(r.getBoolean(4), s"${r.getString(0)} orders out of bound")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("percentile_approx stays within its accuracy contract of exact") {
    // The sketch analog of the HLL pin: approx_percentile's error bound
    // is rank-based — with accuracy a, the returned value's rank is
    // within n/a of the target rank. Checked against the exact
    // distribution-method percentiles at a = 100 over lineitem prices.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, lit}
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    val approx = li.agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 100)"))
      .head.getSeq[Double](0)
    val exact = graft.operators.Profiling
      .groupedPercentiles(li, lit(1), col("l_extendedprice"),
        Seq(0.5 -> "p50", 0.9 -> "p90"))
      .select($"p50", $"p90").as[(Double, Double)].head()
    val sorted = li.select($"l_extendedprice".cast("double")).as[Double]
      .collect().sorted
    def rankOf(v: Double): Long = sorted.count(_ <= v).toLong
    for (((a, e), p) <- approx.zip(Seq(exact._1, exact._2)).zip(Seq(0.5, 0.9))) {
      val rankErr = math.abs(rankOf(a) - p * n)
      assert(rankErr <= n / 100 + 1,
        s"p$p: approx $a (rank ${rankOf(a)}) vs exact $e, rank err $rankErr")
    }
  }

  test("text_bm25 parity") {
    check("text_bm25",
      """WITH words AS (
        |  SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM words
        |       WHERE term IN ('hash', 'join', 'spark') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT t.doc_id, count(*) AS n_terms_hit,
        |  CAST(sum(CAST(round(
        |    ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) /
        |              (CAST(d.df AS DOUBLE) + 0.5)) *
        |    (CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
        |    (CAST(t.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) +
        |       0.75 * CAST(l.dl AS DOUBLE) /
        |       (CAST(s.tot_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))),
        |    6) AS DECIMAL(18,6))) AS DOUBLE) AS score
        |FROM tf t JOIN df d USING (term) JOIN dl l ON t.doc_id = l.doc_id
        |CROSS JOIN stats s
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)
  }

  test("pipeline_seq_pack parity") {
    check("pipeline_seq_pack",
      """WITH toks AS (
        |  SELECT doc_id, source AS shard,
        |         CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum_end
        |  FROM toks)
        |SELECT doc_id, shard, n_tokens,
        |  (cum_end - n_tokens) div 256 AS seq_id,
        |  CAST((cum_end - n_tokens) % 256 AS BIGINT) AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin)
  }

  test("threshold-style TPC-H analogs are non-empty (non-vacuous oracle)") {
    // These three shipped 0 rows on both engines in earlier rounds,
    // making the oracle compare vacuously green — any predicate bug that
    // also yields empty output would pass. Pin non-emptiness at sf0.001.
    for (name <- Seq("q_tpch_q11", "q_tpch_q20", "q_tpch_q22")) {
      assert(SparkEntry.queries(name)(spark, sfDir).limit(1).count() === 1L,
        s"$name returned no rows — its oracle gate would be vacuous")
    }
  }

  test("custom SQL functions compose with views (rolling_fingerprint)") {
    ready
    val viaSql = spark.sql(
      "SELECT doc_id, rolling_fingerprint(text, 16) AS fp FROM documents ORDER BY doc_id")
    import org.apache.spark.sql.functions.col
    val api = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.functions.rolling_fingerprint(col("text"), 16).as("fp"))
      .orderBy("doc_id")
    assert(rows(api) === rows(viaSql))
  }
}
