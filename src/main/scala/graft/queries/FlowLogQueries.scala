package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.FlowLog

/** Driver-verifiable queries for every flow-log operator group
  * (SURVEY.md §7.2 phases A+B). Each `queries` entry has a matching
  * DuckDB `oracle` statement; the SQL mirrors the Spark plan via the
  * shared CTE fragments below, so any semantic drift between the two is
  * caught by the driver's hash compare.
  */
object FlowLogQueries {

  // ---- shared DuckDB CTE fragments (mirror FlowLog.scala exactly) ----

  private val Rx = FlowLog.FlowRegex
  private val PrivRx = FlowLog.Rfc1918Regex

  private val linesCte =
    s"""lines AS (
       |  SELECT CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS id,
       |         CASE WHEN l_orderkey % 53 = 0
       |              THEN 'MALFORMED ' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)
       |              ELSE concat_ws(' ', '2', '123456789012',
       |                'eni-' || CAST(l_suppkey AS VARCHAR),
       |                CASE WHEN l_linenumber % 3 = 0
       |                     THEN '52.' || CAST(l_partkey % 30 AS VARCHAR) || '.0.1'
       |                     ELSE '10.' || CAST(l_partkey % 256 AS VARCHAR) || '.'
       |                          || CAST(l_orderkey % 256 AS VARCHAR) || '.'
       |                          || CAST(l_suppkey % 254 + 1 AS VARCHAR) END,
       |                '172.31.16.' || CAST(l_orderkey % 200 + 1 AS VARCHAR),
       |                CAST(l_orderkey % 60000 + 1024 AS VARCHAR),
       |                CASE WHEN l_linenumber % 2 = 0 THEN '443' ELSE '22' END,
       |                CASE WHEN l_linenumber % 2 = 0 THEN '6' ELSE '17' END,
       |                CAST((l_linenumber * 7) % 100 + 1 AS VARCHAR),
       |                CAST((l_orderkey % 1000) * l_linenumber + 40 AS VARCHAR),
       |                CAST(l_orderkey % 86400 + 1418530010 AS VARCHAR),
       |                CAST(l_orderkey % 86400 + 1418530070 AS VARCHAR),
       |                CASE WHEN (l_orderkey + l_linenumber) % 10 < 8 THEN 'ACCEPT' ELSE 'REJECT' END,
       |                CASE WHEN l_orderkey % 20 = 0 THEN 'NODATA'
       |                     WHEN l_orderkey % 20 = 1 THEN 'SKIPDATA'
       |                     ELSE 'OK' END)
       |         END AS line
       |  FROM lineitem)""".stripMargin

  // DuckDB's regexp_extract caps capture groups at 9, so the oracle
  // extracts the 14 fields of a *valid* line via split_part (equivalent for
  // lines that pass the full-regex validation) — an independent
  // implementation of the same semantics, which is what an oracle should be.
  private val parsedCte =
    s"""parsed AS (
       |  SELECT id, line,
       |         NOT regexp_matches(line, '$Rx') AS error,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 1) AS INTEGER) END AS version,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN split_part(line, ' ', 2) END AS account_id,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN split_part(line, ' ', 3) END AS interface_id,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN split_part(line, ' ', 4) END AS srcaddr,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN split_part(line, ' ', 5) END AS destaddr,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 6) AS INTEGER) END AS srcport,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 7) AS INTEGER) END AS dstport,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 8) AS INTEGER) END AS protocol,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 9) AS BIGINT) END AS packets,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 10) AS BIGINT) END AS bytes,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 11) AS BIGINT) END AS "start",
       |         CASE WHEN regexp_matches(line, '$Rx') THEN CAST(split_part(line, ' ', 12) AS BIGINT) END AS "end",
       |         CASE WHEN regexp_matches(line, '$Rx') THEN split_part(line, ' ', 13) END AS action,
       |         CASE WHEN regexp_matches(line, '$Rx') THEN split_part(line, ' ', 14) END AS log_status
       |  FROM lines)""".stripMargin

  private val eniCte =
    """eni AS (
      |  SELECT 'eni-' || CAST(s_suppkey AS VARCHAR) AS interface_id,
      |         ['sg-' || CAST(s_suppkey % 7 AS VARCHAR),
      |          'sg-' || CAST(s_suppkey % 13 + 100 AS VARCHAR)] AS security_group_ids,
      |         '172.31.16.' || CAST(s_suppkey % 200 + 1 AS VARCHAR) AS ip_address
      |  FROM supplier WHERE s_suppkey % 10 <> 0)""".stripMargin

  private val geoCte =
    """geo AS (
      |  SELECT '52.' || CAST(n_nationkey AS VARCHAR) || '.0.1' AS ip,
      |         'C' || CAST(n_nationkey AS VARCHAR) AS country_code,
      |         n_name AS country_name,
      |         CAST(r_regionkey AS VARCHAR) AS region_code,
      |         r_name AS region_name,
      |         n_name || ' CITY' AS city,
      |         CAST(n_nationkey AS DOUBLE) * 3.7 - 45.0 AS latitude,
      |         CAST(n_regionkey AS DOUBLE) * 31.0 - 60.0 AS longitude
      |  FROM nation JOIN region ON n_regionkey = r_regionkey)""".stripMargin

  private val enr1Cte =
    s"""enr1 AS (
       |  SELECT p.*, e.security_group_ids, e.ip_address,
       |         CASE WHEN e.ip_address IS NULL THEN NULL
       |              WHEN p.destaddr = e.ip_address THEN 'inbound'
       |              ELSE 'outbound' END AS direction,
       |         regexp_matches(p.srcaddr, '$PrivRx') AS is_private
       |  FROM parsed p LEFT JOIN eni e ON p.interface_id = e.interface_id)""".stripMargin

  private val enr2Cte =
    """enr2 AS (
      |  SELECT e1.*,
      |         COALESCE(g.country_code, '') AS country_code,
      |         COALESCE(g.country_name, '') AS country_name,
      |         COALESCE(g.region_code, '') AS region_code,
      |         COALESCE(g.region_name, '') AS region_name,
      |         COALESCE(g.city, '') AS city,
      |         COALESCE(g.latitude, 0.0) AS lat,
      |         COALESCE(g.longitude, 0.0) AS lon
      |  FROM enr1 e1 LEFT JOIN geo g ON e1.srcaddr = g.ip AND NOT e1.is_private)""".stripMargin

  private def withCtes(ctes: String*)(select: String): String =
    s"WITH ${ctes.mkString(",\n")}\n$select"

  // ---- Spark-side helpers ----

  /** Fresh scratch dir for the round-trip queries, removed recursively
    * on JVM exit — plan-enumerating suites invoke every query function
    * and would otherwise leak one directory per enumeration. Fresh per
    * call (not a fixed path) so concurrent enumerations never race on
    * one dir. One JVM-wide shutdown hook drains a concurrent queue of
    * registered dirs (a hook per call would accumulate one live Thread
    * per enumeration for the JVM lifetime). */
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = scratchDirs.poll()
      while (p != null) {
        try {
          val walk = java.nio.file.Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            walk.iterator().asScala.toSeq.reverse
              .foreach(f => try java.nio.file.Files.deleteIfExists(f)
                catch { case _: java.io.IOException => () })
          } finally walk.close()
        } catch { case _: Exception => () }
        p = scratchDirs.poll()
      }
    }))
  private[queries] def scratchDir(prefix: String): String = {
    scratchHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  private[queries] def parsed(s: SparkSession, d: String): DataFrame =
    FlowLog.parseFlowLines(FlowLog.synthesizeLines(Tables.lineitem(s, d)))

  private def enriched(s: SparkSession, d: String): DataFrame =
    FlowLog.enrich(parsed(s, d),
      FlowLog.eniDimension(Tables.supplier(s, d)),
      FlowLog.geoDimension(Tables.nation(s, d), Tables.region(s, d)))

  // ---- queries + oracles ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // OP-9/OP-10: regex scan → typed struct
    "flow_parse" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .select(col("id"), col("version"), col("account_id"),
          col("interface_id"), col("srcaddr"), col("destaddr"),
          col("srcport"), col("dstport"), col("protocol"), col("packets"),
          col("bytes"), col("start"), col("end"), col("action"),
          col("log_status"))
        .orderBy("id")),

    // OP-12: validation / dead-letter split with original payload
    "flow_deadletter" -> ((s, d) =>
      parsed(s, d)
        .select(col("id"),
          when(col("error"), "ProcessingFailed").otherwise("Ok").as("result"),
          when(col("error"), col("line")).as("payload"))
        .orderBy("id")),

    // OP-13/OP-14: dimension build + broadcast left lookup join. Uses
    // the ENI-only enrichment stage — the geo join would survive in the
    // plan unused (left joins aren't eliminable without key-uniqueness).
    "flow_eni_join" -> ((s, d) =>
      FlowLog.enrichEni(parsed(s, d),
        FlowLog.eniDimension(Tables.supplier(s, d)))
        .filter(!col("error"))
        .select(col("id"), col("interface_id"),
          coalesce(array_join(col("security_group_ids"), ","), lit(""))
            .as("sg_ids"),
          coalesce(col("ip_address"), lit("")).as("ip_address"))
        .orderBy("id")),

    // OP-15: derived direction column (ENI-only stage, same reasoning)
    "flow_direction" -> ((s, d) =>
      FlowLog.enrichEni(parsed(s, d),
        FlowLog.eniDimension(Tables.supplier(s, d)))
        .filter(!col("error"))
        .select(col("id"), col("destaddr"),
          coalesce(col("ip_address"), lit("")).as("ip_address"),
          coalesce(col("direction"), lit("")).as("direction"))
        .orderBy("id")),

    // Exfiltration screen: per-interface outbound/inbound byte
    // asymmetry — a host shipping 10× more than it receives (above a
    // floor) is the classic exfil posture next to the port-scan and
    // beacon panels. One aggregation over the eni-enriched flows
    // (conditional sums — no second pass); the ratio test is pure
    // integer cross-multiplication, no division anywhere.
    "flow_exfil_ratio" -> ((s, d) =>
      FlowLog.enrichEni(parsed(s, d),
        FlowLog.eniDimension(Tables.supplier(s, d)))
        .filter(!col("error") && col("direction").isNotNull)
        .groupBy(col("interface_id"))
        .agg(
          sum(when(col("direction") === "outbound", col("bytes"))
            .otherwise(0L)).as("out_bytes"),
          sum(when(col("direction") === "inbound", col("bytes"))
            .otherwise(0L)).as("in_bytes"),
          count(lit(1)).as("n_flows"))
        .select(col("interface_id"), col("out_bytes"), col("in_bytes"),
          col("n_flows"),
          (col("out_bytes") > col("in_bytes") * 10 &&
            col("out_bytes") > 100000L).as("exfil_flag"))
        .orderBy("interface_id")),

    // OP-16: RFC1918 membership predicate as a filter
    "flow_rfc1918" -> ((s, d) =>
      parsed(s, d)
        .filter(!col("error") && col("srcaddr").rlike(FlowLog.Rfc1918Regex))
        .select(col("id"), col("srcaddr"))
        .orderBy("id")),

    // OP-17/OP-18: geo enrichment join + blank defaulting
    "flow_geo" -> ((s, d) =>
      enriched(s, d).filter(!col("error"))
        .select(col("id"), col("srcaddr"), col("is_private"),
          col("country_code"), col("country_name"), col("region_code"),
          col("region_name"), col("city"),
          col("source_location.lat").as("lat"),
          col("source_location.lon").as("lon"))
        .orderBy("id")),

    // Full decorator output (flagship, flattened for the oracle)
    "flow_enriched" -> ((s, d) =>
      enriched(s, d).filter(!col("error"))
        .select(col("id"), col("version"), col("account_id"),
          col("interface_id"), col("srcaddr"), col("destaddr"),
          col("srcport"), col("dstport"), col("protocol"), col("packets"),
          col("bytes"), col("start"), col("end"), col("action"),
          col("log_status"),
          coalesce(array_join(col("security_group_ids"), ","), lit(""))
            .as("sg_ids"),
          coalesce(col("ip_address"), lit("")).as("ip_address"),
          coalesce(col("direction"), lit("")).as("direction"),
          col("is_private"), col("country_code"), col("country_name"),
          col("region_code"), col("region_name"), col("city"),
          col("source_location.lat").as("lat"),
          col("source_location.lon").as("lon"))
        .orderBy("id")),

    // OP-13 on its native nested shape: the JMESPath triple
    // (list / map / filter projection over DescribeNetworkInterfaces,
    // decorator/index.js:85-90) as explode + transform + filter
    // higher-order functions over a nested-struct response fixture.
    "flow_eni_nested" -> ((s, d) =>
      FlowLog.eniMappingFromNested(
        FlowLog.eniDescribeResponse(Tables.supplier(s, d)))
        .select(col("interface_id"),
          array_join(col("security_group_ids"), ",").as("sg_ids"),
          col("ip_address"))
        .orderBy("interface_id")),

    // PII coarsening + keyed pseudonymization before logs leave the
    // security boundary: /24 masking plus salted-md5 pseudonyms.
    "flow_ip_anonymize" -> ((s, d) =>
      FlowLog.anonymizeIps(parsed(s, d)).orderBy("id")),

    // OP-22: side-output success/failure counters
    "flow_batch_counts" -> ((s, d) =>
      parsed(s, d).groupBy(col("error")).agg(count(lit(1)).as("n"))
        .orderBy("error")),

    // ---- ES-dashboard analytics: the panels the reference ships flow
    // logs to Elasticsearch FOR (README.md:3 — "search and analyze").
    // Top talkers: the destinations receiving the most traffic.
    // Deterministic top-k (ties broken by address) over a 1-shuffle
    // aggregation; the limit rides the sort — TakeOrderedAndProject,
    // no global sort materialization.
    "flow_top_talkers" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .groupBy(col("destaddr"))
        .agg(sum(col("bytes")).as("total_bytes"),
          sum(col("packets")).as("total_packets"),
          count(lit(1)).as("n_flows"))
        .orderBy(col("total_bytes").desc, col("destaddr"))
        .limit(20)),

    // Reject ratio per ENI: the "which interfaces are being probed"
    // security panel. One doc_id-free aggregation keyed by interface;
    // the ratio divides two exact counts (engine-stable IEEE division).
    "flow_reject_by_eni" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .groupBy(col("interface_id"))
        .agg(count(lit(1)).as("n_flows"),
          sum(when(col("action") === "REJECT", 1L).otherwise(0L))
            .as("n_rejects"),
          sum(when(col("action") === "REJECT", col("bytes")).otherwise(0L))
            .as("rejected_bytes"))
        .withColumn("reject_ratio",
          col("n_rejects").cast("double") / col("n_flows").cast("double"))
        .orderBy("interface_id")),

    // OP-17 against a RANGE geo table (the MaxMind shape): prefix-
    // bucketed equi-join with the between-predicate inside the hash
    // join — never a nested-loop range scan.
    "flow_geo_range" -> ((s, d) =>
      FlowLog.enrichGeoByRange(parsed(s, d).filter(!col("error")),
        FlowLog.geoRangeDimension(Tables.nation(s, d), Tables.region(s, d)))
        .select(col("id"), col("srcaddr"), col("src_long"),
          coalesce(col("country_name"), lit("")).as("country_name"),
          coalesce(col("region_name"), lit("")).as("region_name"))
        .orderBy("id")),

    // CIDR matching as integer shift-compare arithmetic (no regex, no
    // UDF): the security-group / subnet filters every flow-log analysis
    // applies, plus the ip-as-long column range analytics join on.
    "flow_cidr_filter" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .select(col("id"), col("srcaddr"),
          FlowLog.ipToLong(col("srcaddr")).as("src_long"),
          FlowLog.inCidr(col("srcaddr"), "10.0.0.0/8").as("in_10_8"),
          FlowLog.inCidr(col("destaddr"), "172.31.0.0/16").as("dst_in_vpc"),
          FlowLog.isRfc1918Cidr(col("srcaddr")).as("is_private_cidr"))
        .orderBy("id")),

    // Traffic timeseries: bytes/packets per event-time hour bucket and
    // action — the headline dashboard chart. Pure integer bucketing on
    // the flow's own epoch seconds (event time, not processing time).
    "flow_traffic_timeseries" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .groupBy((expr("`start` div 3600") * 3600).as("bucket_start"),
          col("action"))
        .agg(count(lit(1)).as("n_flows"),
          sum(col("bytes")).as("total_bytes"),
          sum(col("packets")).as("total_packets"))
        .orderBy("bucket_start", "action")),

    // Port-scan detection: sources touching many distinct (dest, port)
    // targets inside one event-time hour — the security alert an ES
    // flow dashboard exists to raise. One aggregation keyed by
    // (srcaddr, hour) with two COUNT DISTINCTs: Spark plans an Expand
    // (×2) with partial distinct-aggregation before the single
    // exchange, so duplicate targets collapse map-side. (Measured: the
    // alternative pre-aggregate-per-target plan adds a full extra
    // shuffle and is ~1.5× slower at sf0.1 — the Expand is cheaper.)
    "flow_port_scan" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .groupBy(col("srcaddr"), expr("`start` div 3600").as("hour_bucket"))
        .agg(
          countDistinct(concat_ws(":", col("destaddr"),
            col("dstport").cast("string"))).as("n_targets"),
          countDistinct(col("dstport")).as("n_ports"),
          count(lit(1)).as("n_flows"))
        .filter(col("n_targets") >= 3)
        .orderBy("srcaddr", "hour_bucket")),

    // Destination-port Shannon entropy per interface — the
    // concentration signal next to flow_port_scan's cardinality one:
    // near-zero entropy = hammering one port (beaconing / exfil over a
    // fixed channel), near-ln(n_ports) = uniform spread (sweep, or
    // tunnel mixing). Determinism discipline: the per-port terms
    // c·ln(c) quantize to integer micro-units via floor(x·1e6 + 0.5)
    // (exact IEEE floor — the dsir/unigram-LM contract) and sum as
    // BIGINTs, so H = ln(N) − (Σ terms)/N has no order-dependent
    // float sum anywhere; the final division is integer `div`.
    // Scale shape: two keyed aggregations with full map-side partials
    // ((eni, port) then eni) — bounded by distinct ports, never flows.
    "flow_port_entropy" -> ((s, d) =>
      parsed(s, d).filter(!col("error"))
        .groupBy(col("interface_id"), col("dstport"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("interface_id"))
        .agg(sum(col("c")).as("n_flows"),
          count(lit(1)).as("n_ports"),
          sum(expr("cast(floor(c * ln(c) * 1000000.0 + 0.5) as bigint)"))
            .as("terms"))
        .select(col("interface_id"), col("n_flows"), col("n_ports"),
          (expr("cast(floor(ln(n_flows) * 1000000.0 + 0.5) as bigint)") -
            expr("terms div n_flows")).as("entropy_micro"))
        .orderBy("interface_id")),

    // EWMA traffic-anomaly screen: per-interface 10-minute flow counts
    // against an 80-minute exponentially-decayed baseline (halving
    // weights 2^(8-i), denominator 255 — the whole EWMA is integer
    // arithmetic, no float decay chain). The grid is DENSE: inactive
    // hours enter as 0 via a broadcast cross of the interface dim with
    // the observed-bucket dim, otherwise lag() silently skips gaps and
    // the baseline drifts high. Spike = count > 1.5× baseline, dip =
    // count < 2/3× baseline, judged only once 8 buckets of history
    // exist. Scale shape: one (eni, bucket) aggregate with map-side
    // combine, one bounded broadcast grid join, one per-eni window —
    // the same cost as flow_traffic_timeseries plus a lag frame.
    "flow_ewma_anomaly" -> ((s, d) => {
      val counts = parsed(s, d).filter(!col("error"))
        .groupBy(col("interface_id"), expr("`start` div 600").as("bucket"))
        .agg(count(lit(1)).as("n_flows"))
      val enis = counts.select(col("interface_id")).distinct()
      val buckets = counts.select(col("bucket")).distinct()
      val dense = enis.crossJoin(broadcast(buckets))
        .join(counts, Seq("interface_id", "bucket"), "left")
        .na.fill(0L, Seq("n_flows"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("interface_id")).orderBy(col("bucket"))
      val weighted = (1 to 8)
        .map(i => coalesce(lag(col("n_flows"), i).over(w), lit(0L)) *
          lit(1L << (8 - i)))
        .reduce(_ + _)
      dense
        .withColumn("rn", row_number().over(w))
        .withColumn("wsum", weighted)
        .filter(col("rn") > 8)
        .select(col("interface_id"), col("bucket"), col("n_flows"),
          expr("wsum div 255").as("baseline"),
          when(col("n_flows") * 2 > expr("wsum div 255") * 3, "spike")
            .when(col("n_flows") * 3 < expr("wsum div 255") * 2, "dip")
            .otherwise("normal").as("status"))
        .orderBy("interface_id", "bucket")
    }),

    // Beacon detection: (src, dst) pairs whose connection inter-arrival
    // gaps are suspiciously regular — the C2-beaconing panel next to the
    // port-scan alert. One lag window per pair (partition key = the
    // pair, deterministic id tie-break on equal timestamps), then an
    // aggregate deriving the gap variance from exact decimal sums —
    // variance = (Σg² − (Σg)²/n)/(n−1) computed in ONE fixed IEEE chain,
    // so any partial-aggregation order yields identical bits.
    "flow_beacon_detect" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("srcaddr"), col("destaddr"))
        .orderBy(col("start"), col("id"))
      val gaps = parsed(s, d).filter(!col("error"))
        .select(col("srcaddr"), col("destaddr"), col("start"), col("id"))
        .withColumn("gap", col("start") - lag(col("start"), 1).over(w))
        .filter(col("gap").isNotNull)
        // cast BEFORE squaring: a LongType gap*gap wraps silently past
        // ~3.04e9 (epoch-millis gaps) under non-ANSI eval; decimal
        // multiply widens instead (18,0)x(18,0) -> (37,0). Bound ONCE
        // here, not inline in both aggregates: the inline form repeated
        // the long→decimal cast across aggregate expressions and
        // measured 2.15 s steady-state at sf0.1 vs 1.59 s with the
        // single projected column (identical hashes).
        .select(col("srcaddr"), col("destaddr"),
          col("gap").cast("decimal(18,0)").as("gap_dec"))
      gaps.groupBy(col("srcaddr"), col("destaddr"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_dec")).as("sg"),
          sum(col("gap_dec") * col("gap_dec")).as("sg2"))
        .filter(col("n_gaps") >= 4)
        .select(col("srcaddr"), col("destaddr"), col("n_gaps"),
          (col("sg").cast("double") / col("n_gaps").cast("double"))
            .as("mean_gap"),
          ((col("sg2").cast("double") -
            col("sg").cast("double") * col("sg").cast("double") /
              col("n_gaps").cast("double")) /
            (col("n_gaps").cast("double") - lit(1.0))).as("var_gap"))
        .orderBy("srcaddr", "destaddr")
    }),

    // OP-4/OP-5: control-message filter + newline projection (ingestor)
    "ingest_filter_project" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") =!= "error")
        .select(col("event_id"), concat(col("props"), lit("\n")).as("data"))
        .orderBy("event_id")),

    // OP-3/OP-20: JSON parse + re-serialize round-trip
    "flow_json_roundtrip" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long")
            .as("k"))
        .withColumn("rejson", to_json(struct(col("k"))))
        .orderBy("event_id")),

    // OP-8/OP-20: base64 decode/encode round-trip over text payloads.
    // 48-byte prefix: Spark's base64 MIME-chunks beyond 76 output chars,
    // DuckDB's does not — keep outputs in the unchunked range.
    "flow_base64_roundtrip" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          base64(substring(col("text"), 1, 48).cast("binary")).as("b64"))
        .withColumn("decoded", unbase64(col("b64")).cast("string"))
        .orderBy("doc_id")),

    // OP-21 through the second columnar format: the parsed flow records
    // land in an action-partitioned ORC table (Sinks.writePartitioned —
    // the real flow-lake layout) and are read BACK for the exact
    // flow_parse projection, proving write→read identity on every type
    // including the partition column. DuckDB has no ORC reader, but the
    // round-trip is identity on values, so the oracle computes the same
    // projection from the source tables directly and the row is fully
    // hash-gated. A fresh temp dir per invocation keeps concurrent
    // suites enumerating the query from racing on one path.
    "flow_orc_roundtrip" -> ((s, d) => {
      val path = scratchDir("graft_orc_rt")
      graft.sources.Sinks.writePartitioned(
        parsed(s, d).filter(!col("error") && expr("(id div 8) % 8") === 0)
          .select(col("id"), col("version"), col("account_id"),
            col("interface_id"), col("srcaddr"), col("destaddr"),
            col("srcport"), col("dstport"), col("protocol"),
            col("packets"), col("bytes"), col("start"), col("end"),
            col("action"), col("log_status")),
        path, Seq("action"), format = "orc")
      s.read.orc(path)
        .select(col("id"), col("version"), col("account_id"),
          col("interface_id"), col("srcaddr"), col("destaddr"),
          col("srcport"), col("dstport"), col("protocol"), col("packets"),
          col("bytes"), col("start"), col("end"), col("action"),
          col("log_status"))
        .orderBy("id")
    }),

    // Same identity contract through the TEXT sources: CSV with header
    // read back under an explicit schema (exercises the quote/escape/
    // type-parse path), and JSON-lines read back under the same schema
    // (the interchange format most ingest pipelines actually speak).
    // Oracles are the flow_parse projection; any serialization drift
    // hash-fails.
    "flow_csv_roundtrip" -> ((s, d) => {
      val path = scratchDir("graft_csv_rt")
      val out = parsed(s, d).filter(!col("error") && expr("(id div 8) % 8") === 0)
        .select(col("id"), col("version"), col("account_id"),
          col("interface_id"), col("srcaddr"), col("destaddr"),
          col("srcport"), col("dstport"), col("protocol"), col("packets"),
          col("bytes"), col("start"), col("end"), col("action"),
          col("log_status"))
      // Distinct nullValue so empty string and null survive the trip
      // distinguishably (Spark's CSV default maps both to "" on write
      // and both back to null on read). The parsed projection emits
      // neither today, so this only hardens the contract.
      out.write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N").csv(path)
      s.read.schema(out.schema).option("header", "true")
        .option("nullValue", "\\N").csv(path)
        .orderBy("id")
    }),

    "flow_jsonl_roundtrip" -> ((s, d) => {
      val path = scratchDir("graft_jsonl_rt")
      val out = parsed(s, d).filter(!col("error") && expr("(id div 8) % 8") === 0)
        .select(col("id"), col("version"), col("account_id"),
          col("interface_id"), col("srcaddr"), col("destaddr"),
          col("srcport"), col("dstport"), col("protocol"), col("packets"),
          col("bytes"), col("start"), col("end"), col("action"),
          col("log_status"))
      out.write.mode("overwrite").json(path)
      s.read.schema(out.schema).json(path)
        .orderBy("id")
    })
  )

  val oracle: Map[String, String] = Map(
    "flow_parse" -> withCtes(linesCte, parsedCte)(
      """SELECT id, version, account_id, interface_id, srcaddr, destaddr,
        |       srcport, dstport, protocol, packets, bytes, "start", "end",
        |       action, log_status
        |FROM parsed WHERE NOT error ORDER BY id""".stripMargin),

    // Identity round-trip: the oracle is flow_parse's projection — any
    // value/type drift introduced by the ORC write→read shows as a
    // hash mismatch against it.
    "flow_orc_roundtrip" -> withCtes(linesCte, parsedCte)(
      """SELECT id, version, account_id, interface_id, srcaddr, destaddr,
        |       srcport, dstport, protocol, packets, bytes, "start", "end",
        |       action, log_status
        |FROM parsed WHERE NOT error AND (id // 8) % 8 = 0 ORDER BY id""".stripMargin),

    "flow_csv_roundtrip" -> withCtes(linesCte, parsedCte)(
      """SELECT id, version, account_id, interface_id, srcaddr, destaddr,
        |       srcport, dstport, protocol, packets, bytes, "start", "end",
        |       action, log_status
        |FROM parsed WHERE NOT error AND (id // 8) % 8 = 0 ORDER BY id""".stripMargin),

    "flow_jsonl_roundtrip" -> withCtes(linesCte, parsedCte)(
      """SELECT id, version, account_id, interface_id, srcaddr, destaddr,
        |       srcport, dstport, protocol, packets, bytes, "start", "end",
        |       action, log_status
        |FROM parsed WHERE NOT error AND (id // 8) % 8 = 0 ORDER BY id""".stripMargin),

    "flow_deadletter" -> withCtes(linesCte, parsedCte)(
      """SELECT id,
        |       CASE WHEN error THEN 'ProcessingFailed' ELSE 'Ok' END AS result,
        |       CASE WHEN error THEN line END AS payload
        |FROM parsed ORDER BY id""".stripMargin),

    "flow_eni_join" -> withCtes(linesCte, parsedCte, eniCte, geoCte, enr1Cte)(
      """SELECT id, interface_id,
        |       COALESCE(array_to_string(security_group_ids, ','), '') AS sg_ids,
        |       COALESCE(ip_address, '') AS ip_address
        |FROM enr1 WHERE NOT error ORDER BY id""".stripMargin),

    "flow_direction" -> withCtes(linesCte, parsedCte, eniCte, geoCte, enr1Cte)(
      """SELECT id, destaddr, COALESCE(ip_address, '') AS ip_address,
        |       COALESCE(direction, '') AS direction
        |FROM enr1 WHERE NOT error ORDER BY id""".stripMargin),

    "flow_rfc1918" -> withCtes(linesCte, parsedCte)(
      s"""SELECT id, srcaddr FROM parsed
         |WHERE NOT error AND regexp_matches(srcaddr, '$PrivRx')
         |ORDER BY id""".stripMargin),

    "flow_port_scan" -> withCtes(linesCte, parsedCte)(
      """SELECT srcaddr, "start" // 3600 AS hour_bucket,
        |       count(DISTINCT destaddr || ':' || CAST(dstport AS VARCHAR))
        |         AS n_targets,
        |       count(DISTINCT dstport) AS n_ports,
        |       count(*) AS n_flows
        |FROM parsed WHERE NOT error
        |GROUP BY srcaddr, hour_bucket
        |HAVING count(DISTINCT destaddr || ':' || CAST(dstport AS VARCHAR)) >= 3
        |ORDER BY srcaddr, hour_bucket""".stripMargin),

    "flow_port_entropy" -> withCtes(linesCte, parsedCte,
      """pc AS (
        |  SELECT interface_id, dstport, CAST(count(*) AS BIGINT) AS c
        |  FROM parsed WHERE NOT error GROUP BY interface_id, dstport)""".stripMargin,
      """ag AS (
        |  SELECT interface_id, CAST(sum(c) AS BIGINT) AS n_flows,
        |         count(*) AS n_ports,
        |         CAST(sum(CAST(floor(c * ln(c) * 1000000.0 + 0.5)
        |           AS BIGINT)) AS BIGINT) AS terms
        |  FROM pc GROUP BY interface_id)""".stripMargin)(
      """SELECT interface_id, n_flows, n_ports,
        |       CAST(floor(ln(n_flows) * 1000000.0 + 0.5) AS BIGINT)
        |         - terms // n_flows AS entropy_micro
        |FROM ag ORDER BY interface_id""".stripMargin),

    "flow_exfil_ratio" -> withCtes(linesCte, parsedCte, eniCte, enr1Cte)(
      """SELECT interface_id,
        |       CAST(sum(CASE WHEN direction = 'outbound' THEN bytes
        |                     ELSE 0 END) AS BIGINT) AS out_bytes,
        |       CAST(sum(CASE WHEN direction = 'inbound' THEN bytes
        |                     ELSE 0 END) AS BIGINT) AS in_bytes,
        |       count(*) AS n_flows,
        |       (sum(CASE WHEN direction = 'outbound' THEN bytes
        |                 ELSE 0 END) >
        |          sum(CASE WHEN direction = 'inbound' THEN bytes
        |              ELSE 0 END) * 10
        |        AND sum(CASE WHEN direction = 'outbound' THEN bytes
        |                ELSE 0 END) > 100000) AS exfil_flag
        |FROM enr1 WHERE NOT error AND direction IS NOT NULL
        |GROUP BY interface_id ORDER BY interface_id""".stripMargin),

    "flow_ewma_anomaly" -> withCtes(linesCte, parsedCte,
      """cnt AS (
        |  SELECT interface_id, "start" // 600 AS bucket,
        |         count(*) AS n_flows
        |  FROM parsed WHERE NOT error
        |  GROUP BY interface_id, "start" // 600)""".stripMargin)(
      """SELECT interface_id, bucket, n_flows,
        |       wsum // 255 AS baseline,
        |       CASE WHEN n_flows * 2 > (wsum // 255) * 3 THEN 'spike'
        |            WHEN n_flows * 3 < (wsum // 255) * 2 THEN 'dip'
        |            ELSE 'normal' END AS status
        |FROM (
        |  SELECT interface_id, bucket, n_flows,
        |         row_number() OVER w AS rn,
        |         coalesce(lag(n_flows, 1) OVER w, 0) * 128 +
        |         coalesce(lag(n_flows, 2) OVER w, 0) * 64 +
        |         coalesce(lag(n_flows, 3) OVER w, 0) * 32 +
        |         coalesce(lag(n_flows, 4) OVER w, 0) * 16 +
        |         coalesce(lag(n_flows, 5) OVER w, 0) * 8 +
        |         coalesce(lag(n_flows, 6) OVER w, 0) * 4 +
        |         coalesce(lag(n_flows, 7) OVER w, 0) * 2 +
        |         coalesce(lag(n_flows, 8) OVER w, 0) AS wsum
        |  FROM (
        |    SELECT e.interface_id, b.bucket,
        |           coalesce(c.n_flows, 0) AS n_flows
        |    FROM (SELECT DISTINCT interface_id FROM cnt) e
        |    CROSS JOIN (SELECT DISTINCT bucket FROM cnt) b
        |    LEFT JOIN cnt c ON c.interface_id = e.interface_id
        |                   AND c.bucket = b.bucket)
        |  WINDOW w AS (PARTITION BY interface_id ORDER BY bucket))
        |WHERE rn > 8
        |ORDER BY interface_id, bucket""".stripMargin),

    "flow_beacon_detect" -> withCtes(linesCte, parsedCte)(
      """SELECT srcaddr, destaddr, n_gaps,
        |       CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap,
        |       (CAST(sg2 AS DOUBLE)
        |         - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |           / CAST(n_gaps AS DOUBLE))
        |         / (CAST(n_gaps AS DOUBLE) - 1.0) AS var_gap
        |FROM (
        |  SELECT srcaddr, destaddr, count(*) AS n_gaps,
        |         sum(CAST(gap AS DECIMAL(18,0))) AS sg,
        |         sum(CAST(gap AS DECIMAL(18,0)) * CAST(gap AS DECIMAL(18,0))) AS sg2
        |  FROM (
        |    SELECT srcaddr, destaddr,
        |           "start" - lag("start") OVER (
        |             PARTITION BY srcaddr, destaddr
        |             ORDER BY "start", id) AS gap
        |    FROM parsed WHERE NOT error)
        |  WHERE gap IS NOT NULL
        |  GROUP BY srcaddr, destaddr)
        |WHERE n_gaps >= 4
        |ORDER BY srcaddr, destaddr""".stripMargin),

    "flow_geo" -> withCtes(linesCte, parsedCte, eniCte, geoCte, enr1Cte, enr2Cte)(
      """SELECT id, srcaddr, is_private, country_code, country_name,
        |       region_code, region_name, city, lat, lon
        |FROM enr2 WHERE NOT error ORDER BY id""".stripMargin),

    "flow_enriched" -> withCtes(linesCte, parsedCte, eniCte, geoCte, enr1Cte, enr2Cte)(
      """SELECT id, version, account_id, interface_id, srcaddr, destaddr,
        |       srcport, dstport, protocol, packets, bytes, "start", "end",
        |       action, log_status,
        |       COALESCE(array_to_string(security_group_ids, ','), '') AS sg_ids,
        |       COALESCE(ip_address, '') AS ip_address,
        |       COALESCE(direction, '') AS direction,
        |       is_private, country_code, country_name, region_code,
        |       region_name, city, lat, lon
        |FROM enr2 WHERE NOT error ORDER BY id""".stripMargin),

    // An independent nested implementation: DuckDB builds the same
    // struct-array response inline and applies list_transform /
    // list_filter — the engine-native equivalents of the three JMESPath
    // projections Spark runs as transform / filter / explode.
    "flow_eni_nested" ->
      """WITH nested AS (
        |  SELECT 'eni-' || CAST(s_suppkey AS VARCHAR) AS network_interface_id,
        |         [{'group_id': 'sg-' || CAST(s_suppkey % 7 AS VARCHAR),
        |           'group_name': 'grp-' || CAST(s_suppkey % 7 AS VARCHAR)},
        |          {'group_id': 'sg-' || CAST(s_suppkey % 13 + 100 AS VARCHAR),
        |           'group_name': 'grp-' || CAST(s_suppkey % 13 + 100 AS VARCHAR)}] AS groups,
        |         [{'primary': false, 'private_ip_address': '10.0.0.' || CAST(s_suppkey % 250 + 1 AS VARCHAR)},
        |          {'primary': true, 'private_ip_address': '172.31.16.' || CAST(s_suppkey % 200 + 1 AS VARCHAR)}] AS private_ip_addresses
        |  FROM supplier WHERE s_suppkey % 10 <> 0)
        |SELECT network_interface_id AS interface_id,
        |  array_to_string(list_transform(groups, g -> g.group_id), ',') AS sg_ids,
        |  list_filter(private_ip_addresses, ip -> ip."primary")[1].private_ip_address AS ip_address
        |FROM nested ORDER BY interface_id""".stripMargin,

    "flow_ip_anonymize" -> withCtes(linesCte, parsedCte)(
      """SELECT id, interface_id,
        |       regexp_replace(srcaddr, '\.\d+$', '.x') AS src_masked,
        |       regexp_replace(destaddr, '\.\d+$', '.x') AS dst_masked,
        |       substr(md5('graft:' || srcaddr), 1, 12) AS src_pseudo,
        |       substr(md5('graft:' || destaddr), 1, 12) AS dst_pseudo
        |FROM parsed WHERE NOT error ORDER BY id""".stripMargin),

    "flow_batch_counts" -> withCtes(linesCte, parsedCte)(
      "SELECT error, count(*) AS n FROM parsed GROUP BY error ORDER BY error"),

    "flow_top_talkers" -> withCtes(linesCte, parsedCte)(
      """SELECT destaddr,
        |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(packets) AS BIGINT) AS total_packets,
        |       count(*) AS n_flows
        |FROM parsed WHERE NOT error GROUP BY destaddr
        |ORDER BY total_bytes DESC, destaddr LIMIT 20""".stripMargin),

    "flow_reject_by_eni" -> withCtes(linesCte, parsedCte)(
      """SELECT interface_id, count(*) AS n_flows,
        |       CAST(sum(CASE WHEN action = 'REJECT' THEN 1 ELSE 0 END) AS BIGINT) AS n_rejects,
        |       CAST(sum(CASE WHEN action = 'REJECT' THEN bytes ELSE 0 END) AS BIGINT) AS rejected_bytes,
        |       CAST(sum(CASE WHEN action = 'REJECT' THEN 1 ELSE 0 END) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS reject_ratio
        |FROM parsed WHERE NOT error GROUP BY interface_id
        |ORDER BY interface_id""".stripMargin),

    "flow_geo_range" -> withCtes(linesCte, parsedCte)(
      """SELECT id, srcaddr, src_long,
        |       COALESCE(country_name, '') AS country_name,
        |       COALESCE(region_name, '') AS region_name
        |FROM (
        |  SELECT id, srcaddr,
        |    CAST(split_part(srcaddr, '.', 1) AS BIGINT) * 16777216 +
        |    CAST(split_part(srcaddr, '.', 2) AS BIGINT) * 65536 +
        |    CAST(split_part(srcaddr, '.', 3) AS BIGINT) * 256 +
        |    CAST(split_part(srcaddr, '.', 4) AS BIGINT) AS src_long
        |  FROM parsed WHERE NOT error) ipn
        |LEFT JOIN (
        |  SELECT 52 * 16777216 + n_nationkey * 65536 AS range_start,
        |         52 * 16777216 + n_nationkey * 65536 + 65535 AS range_end,
        |         n_name AS country_name, r_name AS region_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey) ranges
        |  ON src_long BETWEEN range_start AND range_end
        |ORDER BY id""".stripMargin),

    // Network constants pre-shifted: 172.31.0.0/16 >> 16 = 44063,
    // 172.16.0.0/12 >> 20 = 2753, 192.168.0.0/16 >> 16 = 49320.
    "flow_cidr_filter" -> withCtes(linesCte, parsedCte)(
      """SELECT id, srcaddr, src_long,
        |       (src_long >> 24) = 10 AS in_10_8,
        |       (dst_long >> 16) = 44063 AS dst_in_vpc,
        |       ((src_long >> 24) = 10 OR (src_long >> 20) = 2753
        |         OR (src_long >> 16) = 49320) AS is_private_cidr
        |FROM (
        |  SELECT id, srcaddr,
        |    CAST(split_part(srcaddr, '.', 1) AS BIGINT) * 16777216 +
        |    CAST(split_part(srcaddr, '.', 2) AS BIGINT) * 65536 +
        |    CAST(split_part(srcaddr, '.', 3) AS BIGINT) * 256 +
        |    CAST(split_part(srcaddr, '.', 4) AS BIGINT) AS src_long,
        |    CAST(split_part(destaddr, '.', 1) AS BIGINT) * 16777216 +
        |    CAST(split_part(destaddr, '.', 2) AS BIGINT) * 65536 +
        |    CAST(split_part(destaddr, '.', 3) AS BIGINT) * 256 +
        |    CAST(split_part(destaddr, '.', 4) AS BIGINT) AS dst_long
        |  FROM parsed WHERE NOT error)
        |ORDER BY id""".stripMargin),

    "flow_traffic_timeseries" -> withCtes(linesCte, parsedCte)(
      """SELECT ("start" // 3600) * 3600 AS bucket_start, action,
        |       count(*) AS n_flows,
        |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(packets) AS BIGINT) AS total_packets
        |FROM parsed WHERE NOT error GROUP BY bucket_start, action
        |ORDER BY bucket_start, action""".stripMargin),

    "ingest_filter_project" ->
      """SELECT event_id, props || chr(10) AS data
        |FROM events WHERE event_type <> 'error' ORDER BY event_id""".stripMargin,

    "flow_json_roundtrip" ->
      """SELECT event_id,
        |       CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k,
        |       '{"k":' || regexp_extract(props, '"k": (-?\d+)', 1) || '}' AS rejson
        |FROM events ORDER BY event_id""".stripMargin,

    "flow_base64_roundtrip" ->
      """SELECT doc_id, base64(encode(substr(text, 1, 48))) AS b64,
        |       substr(text, 1, 48) AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
