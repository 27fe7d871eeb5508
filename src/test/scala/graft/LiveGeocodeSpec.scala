package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.operators.FlowLog
import graft.streaming.LiveGeocode
import graft.streaming.LiveGeocode.{GeoClient, GeoInfo}

object CountingClient {
  val calls = new AtomicInteger(0)
}

// Top-level (not an inner class): a client closure must not capture the
// test suite, mirroring the serializability constraint real clients have.
class FakeClient extends GeoClient {
  override def lookup(ip: String): Option[GeoInfo] = {
    CountingClient.calls.incrementAndGet()
    if (ip.startsWith("52.")) Some(GeoInfo("US", "UNITED STATES", "WA",
      "WASHINGTON", "SEATTLE", 47.6, -122.3))
    else None // service miss → blank-geo fallback
  }
}

/** Live geocode path: distinct-IP lookup, per-record blank fallback,
  * disabled-flag semantics. */
class LiveGeocodeSpec extends SparkSpec {
  import spark.implicits._

  def parsedOf(lines: (Long, String)*) =
    FlowLog.parseFlowLines(lines.toDF("id", "line"))

  val eni = Seq(("eni-1", Seq("sg-a"), "172.31.16.21"))
    .toDF("interface_id", "security_group_ids", "ip_address")

  def line(src: String) =
    s"2 123456789012 eni-1 $src 172.31.16.21 1 22 6 1 100 1418530010 1418530070 ACCEPT OK"

  test("looks up each distinct public IP once; private IPs never hit the service") {
    CountingClient.calls.set(0)
    val parsed = parsedOf(
      (1L, line("52.1.2.3")), (2L, line("52.1.2.3")), (3L, line("52.9.9.9")),
      (4L, line("10.1.2.3")), (5L, line("192.168.0.1")))
    val out = LiveGeocode.enrich(parsed, eni, () => new FakeClient,
      enabled = true).orderBy("id").collect()
    assert(CountingClient.calls.get() === 2) // 2 distinct public IPs
    assert(out(0).getAs[String]("country_code") === "US")
    assert(out(3).getAs[String]("country_code") === "") // private → blank
  }

  test("service miss falls back to blank geo per record, not batch failure") {
    CountingClient.calls.set(0)
    val parsed = parsedOf((1L, line("99.99.99.99")))
    val out = LiveGeocode.enrich(parsed, eni, () => new FakeClient,
      enabled = true).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("country_code") === "")
    assert(out(0).getAs[org.apache.spark.sql.Row]("source_location")
      .getDouble(0) === 0.0)
  }

  test("GEOLOCATION_ENABLED=false skips the service entirely") {
    CountingClient.calls.set(0)
    val parsed = parsedOf((1L, line("52.1.2.3")))
    val out = LiveGeocode.enrich(parsed, eni, () => new FakeClient,
      enabled = false).collect()
    assert(CountingClient.calls.get() === 0)
    assert(out(0).getAs[String]("country_code") === "")
  }
}
