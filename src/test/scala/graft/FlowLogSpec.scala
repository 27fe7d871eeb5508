package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.FlowLog

/** Operator-level tests for the flow-log pipeline against the reference's
  * own fixtures: the two base64 records of decorator/event.json decode to
  * the golden lines below (FIXTURES.md §1.1).
  */
class FlowLogSpec extends SparkSpec {
  import spark.implicits._

  val publicLine =
    "2 123456789010 eni-1854f949 72.21.196.65 172.31.16.21 20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK"
  val privateLine =
    "2 123456789010 eni-1854f949 10.3.45.44 172.31.16.21 20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK"

  def parseOne(line: String): Row =
    FlowLog.parseFlowLines(
      Seq((1L, line)).toDF("id", "line")).collect()(0)

  test("golden public-source line parses to typed fields") {
    val r = parseOne(publicLine)
    assert(!r.getAs[Boolean]("error"))
    assert(r.getAs[Int]("version") === 2)
    assert(r.getAs[String]("account_id") === "123456789010")
    assert(r.getAs[String]("interface_id") === "eni-1854f949")
    assert(r.getAs[String]("srcaddr") === "72.21.196.65")
    assert(r.getAs[String]("destaddr") === "172.31.16.21")
    assert(r.getAs[Int]("srcport") === 20641)
    assert(r.getAs[Int]("dstport") === 22)
    assert(r.getAs[Int]("protocol") === 6)
    assert(r.getAs[Long]("packets") === 20L)
    assert(r.getAs[Long]("bytes") === 4249L)
    assert(r.getAs[Long]("start") === 1418530010L)
    assert(r.getAs[Long]("end") === 1418530070L)
    assert(r.getAs[String]("action") === "ACCEPT")
    assert(r.getAs[String]("log_status") === "OK")
  }

  test("malformed lines route to the dead-letter path with fields null") {
    for (bad <- Seq(
        "garbage",
        "2 123456789010 eni-1 1.2.3.4 5.6.7.8 1 2 3 4 5 6 7 DROP OK",
        "2 123456789010 eni-1 1.2.3.4 5.6.7.8 1 2 3 4 5 6 7 ACCEPT",
        "")) {
      val r = parseOne(bad)
      assert(r.getAs[Boolean]("error"), s"expected error for: $bad")
      assert(r.isNullAt(r.fieldIndex("srcaddr")))
    }
  }

  test("RFC1918/loopback predicate matches the reference regex boundaries") {
    val cases = Seq(
      "10.0.0.1" -> true, "127.0.0.1" -> true,
      "172.15.255.255" -> false, "172.16.0.1" -> true,
      "172.31.255.255" -> true, "172.32.0.1" -> false,
      "192.168.1.1" -> true, "192.167.1.1" -> false,
      "72.21.196.65" -> false, "52.0.0.1" -> false)
    val got = cases.map(_._1).toDF("ip")
      .select($"ip", $"ip".rlike(FlowLog.Rfc1918Regex).as("priv"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((ip, want) <- cases) assert(got(ip) === want, ip)
  }

  test("direction is inbound iff destaddr equals the ENI primary IP") {
    val parsed = FlowLog.parseFlowLines(
      Seq((1L, publicLine), (2L, privateLine)).toDF("id", "line"))
    val eni = Seq(("eni-1854f949", Seq("sg-a", "sg-b"), "172.31.16.21"))
      .toDF("interface_id", "security_group_ids", "ip_address")
    val geo = Seq(("72.21.196.65", "US", "UNITED STATES", "WA", "WASHINGTON",
      "SEATTLE", 47.6, -122.3))
      .toDF("ip", "country_code", "country_name", "region_code",
        "region_name", "city", "latitude", "longitude")
    val out = FlowLog.enrich(parsed, eni, geo).orderBy("id").collect()
    assert(out(0).getAs[String]("direction") === "inbound")
    assert(out(0).getAs[Seq[String]]("security_group_ids") === Seq("sg-a", "sg-b"))
    // public source gets geo fields; private gets blanks + 0/0 location
    assert(out(0).getAs[String]("country_code") === "US")
    assert(out(0).getAs[Row]("source_location").getDouble(0) === 47.6)
    assert(out(1).getAs[String]("country_code") === "")
    assert(out(1).getAs[Row]("source_location").getDouble(0) === 0.0)
  }

  test("unmatched ENI leaves direction null and groups empty") {
    val parsed = FlowLog.parseFlowLines(Seq((1L, publicLine)).toDF("id", "line"))
    val eni = Seq(("eni-other", Seq("sg-x"), "1.1.1.1"))
      .toDF("interface_id", "security_group_ids", "ip_address")
    val geo = Seq.empty[(String, String, String, String, String, String, Double, Double)]
      .toDF("ip", "country_code", "country_name", "region_code",
        "region_name", "city", "latitude", "longitude")
    val r = FlowLog.enrich(parsed, eni, geo).collect()(0)
    assert(r.isNullAt(r.fieldIndex("direction")))
    assert(r.isNullAt(r.fieldIndex("security_group_ids")))
  }

  test("nested DescribeNetworkInterfaces extraction equals the flat dimension") {
    // The higher-order-function path (explode + transform + filter over
    // the nested response) must produce exactly the mapping the flat
    // eniDimension builds — same JMESPath semantics, two shapes.
    val supplier = spark.range(1, 101).select($"id".cast("long").as("s_suppkey"))
    val nested = FlowLog.eniMappingFromNested(
      FlowLog.eniDescribeResponse(supplier))
      .select($"interface_id", concat_ws(",", $"security_group_ids").as("sgs"),
        $"ip_address")
    val flat = FlowLog.eniDimension(supplier)
      .select($"interface_id", concat_ws(",", $"security_group_ids").as("sgs"),
        $"ip_address")
    assert(nested.count() === 90) // every 10th ENI absent
    assert(nested.except(flat).count() === 0)
    assert(flat.except(nested).count() === 0)
    // the filter projection picked the PRIMARY ip, not the secondary
    assert(nested.filter($"ip_address".startsWith("172.31.16.")).count() === 90)
  }

  test("anonymizeIps masks the /24 and pseudonyms are keyed + deterministic") {
    val parsed = FlowLog.parseFlowLines(
      Seq((1L, publicLine), (2L, privateLine), (3L, "garbage"))
        .toDF("id", "line"))
    val out = FlowLog.anonymizeIps(parsed)
      .orderBy("id")
      .select($"id", $"src_masked", $"dst_masked", $"src_pseudo")
      .as[(Long, String, String, String)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // dead-letter row excluded
    assert(out(0)._2 === "72.21.196.x")
    assert(out(0)._3 === "172.31.16.x")
    assert(out(1)._2 === "10.3.45.x")
    // keyed: pseudonym is salted, so it differs from a plain md5 prefix
    val plain = java.security.MessageDigest.getInstance("MD5")
      .digest("72.21.196.65".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    assert(out(0)._4 !== plain)
    // deterministic: same salt, same pseudonym across runs
    val again = FlowLog.anonymizeIps(parsed).filter($"id" === 1)
      .select($"src_pseudo").as[String].collect()(0)
    assert(again === out(0)._4)
    // different salt, different pseudonym
    val salted = FlowLog.anonymizeIps(parsed, salt = "other")
      .filter($"id" === 1).select($"src_pseudo").as[String].collect()(0)
    assert(salted !== out(0)._4)
  }

  test("packageRecords: failed rows carry base64 of the original payload") {
    val parsed = FlowLog.parseFlowLines(
      Seq((1L, publicLine), (2L, "broken line")).toDF("id", "line"))
    val eni = Seq(("eni-1854f949", Seq("sg-a"), "172.31.16.21"))
      .toDF("interface_id", "security_group_ids", "ip_address")
    val geo = Seq(("72.21.196.65", "US", "UNITED STATES", "WA", "WASHINGTON",
      "SEATTLE", 47.6, -122.3))
      .toDF("ip", "country_code", "country_name", "region_code",
        "region_name", "city", "latitude", "longitude")
    val out = FlowLog.packageRecords(FlowLog.enrich(parsed, eni, geo))
      .orderBy("id").collect()
    assert(out(0).getAs[String]("result") === "Ok")
    assert(out(1).getAs[String]("result") === "ProcessingFailed")
    // Spark's base64() emits RFC2045 MIME chunking beyond 76 chars.
    val failedPayload = new String(
      java.util.Base64.getMimeDecoder.decode(out(1).getAs[String]("data")))
    assert(failedPayload === "broken line")
    val okJson = new String(
      java.util.Base64.getMimeDecoder.decode(out(0).getAs[String]("data")))
    assert(okJson.contains("\"srcaddr\":\"72.21.196.65\""))
    assert(okJson.contains("\"direction\":\"inbound\""))
  }

  test("flagship entry returns enriched rows with reference field names") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("interface-id"))
    assert(df.columns.contains("source-location"))
    assert(df.count() > 0)
  }

  test("ipToLong and inCidr: integer network matching, edge prefixes") {
    val ips = Seq("10.0.0.1", "10.255.255.255", "11.0.0.0", "172.16.0.0",
      "172.31.255.255", "172.32.0.0", "192.168.7.9", "192.169.0.0",
      "127.0.0.1", "255.255.255.255").toDF("ip")
    val got = ips.select(col("ip"),
      FlowLog.ipToLong(col("ip")).as("n"),
      FlowLog.inCidr(col("ip"), "10.0.0.0/8").as("a"),
      FlowLog.inCidr(col("ip"), "0.0.0.0/0").as("any"),
      FlowLog.inCidr(col("ip"), "255.255.255.255/32").as("exact"),
      FlowLog.isRfc1918Cidr(col("ip")).as("priv"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(got("10.0.0.1")._1 === 10L * 16777216 + 1)
    assert(got("255.255.255.255")._1 === 4294967295L)
    assert(got("255.255.255.255")._4 === true) // /32 exact match
    assert(got.values.forall(_._3 === true)) // /0 matches everything
    assert(got.filter(_._2._2).keySet ===
      Set("10.0.0.1", "10.255.255.255")) // 10/8 boundary
    assert(got.filter(_._2._5).keySet === Set("10.0.0.1", "10.255.255.255",
      "172.16.0.0", "172.31.255.255", "192.168.7.9")) // RFC1918 boundaries
  }

  test("range geo: multi-block ranges match via exploded prefixes, misses null") {
    def ipL(a: Long, b: Long, c: Long, d: Long) = ((a * 256 + b) * 256 + c) * 256 + d
    // one range spanning two /16 blocks — must match in BOTH blocks
    val ranges = Seq((ipL(52, 1, 0, 0), ipL(52, 2, 255, 255), "CC", "RR"))
      .toDF("range_start", "range_end", "country_name", "region_name")
    val flows = Seq((1L, "52.1.5.9"), (2L, "52.2.0.0"), (3L, "52.3.0.0"),
      (4L, "10.0.0.1")).toDF("id", "srcaddr")
    val got = FlowLog.enrichGeoByRange(flows, ranges)
      .select(col("id"), col("country_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "CC" && got(2L) === "CC")
    assert(got(3L) === null && got(4L) === null)
  }

  test("range geo agrees with the exact-ip geo join on the synthesized corpus") {
    // NB: synthesized flow ids collide (the synthetic lineitem carries
    // duplicate (orderkey, linenumber) pairs), so the comparison joins
    // on (id, srcaddr) — the srcaddr determines the geo result.
    val geoExact = SparkEntry.queries("flow_geo")(spark, sfDir)
      .select(col("id"), col("srcaddr"), col("country_name").as("exact_cn"))
      .distinct()
    val geoRange = SparkEntry.queries("flow_geo_range")(spark, sfDir)
      .select(col("id"), col("srcaddr"), col("country_name").as("range_cn"))
      .distinct()
    val disagree = geoExact.join(geoRange, Seq("id", "srcaddr"))
      .filter(col("exact_cn") =!= col("range_cn"))
    assert(disagree.count() === 0L)
    assert(geoExact.count() === geoRange.count())
  }

  test("CIDR-based RFC1918 agrees with the regex on the synthesized corpus") {
    // The regex adds loopback (127/8) to RFC1918; the synthesized corpus
    // contains no loopback addresses, so the two implementations must
    // agree row-for-row there.
    val p = FlowLog.parseFlowLines(
      FlowLog.synthesizeLines(Tables.lineitem(spark, sfDir)))
      .filter(!col("error"))
    val disagree = p.filter(
      col("srcaddr").rlike(FlowLog.Rfc1918Regex) =!=
        FlowLog.isRfc1918Cidr(col("srcaddr")))
    assert(disagree.count() === 0L)
  }
}
