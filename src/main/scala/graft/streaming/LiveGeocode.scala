package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.FlowLog

/** Live-service geolocation (OP-17's HTTP path, decorator/geocode.js):
  * the variant that calls a geocoding service at runtime instead of
  * joining a prebuilt dimension. Gated behind a flag like the
  * reference's GEOLOCATION_ENABLED (template.yaml:78).
  *
  * Scale shape — the opposite of the reference's sequential per-record
  * `await` (decorator/index.js:166-177, §8 Q4): the *distinct public
  * source IPs of the batch* (usually orders of magnitude fewer than
  * records) are looked up by executors in `mapPartitions`, with one
  * client per partition (the reference memoizes its client and API key
  * per invocation, geocode.js:30-31,57), an LRU cache, and a token-
  * bucket rate limit honoring the service quota (README.md:11: 10k
  * requests/month free tier). The result is a per-batch geo dimension
  * that broadcast-joins exactly like the static one. Lookup failures
  * yield blank-geo records (README.md:145's intended per-record
  * fallback, §8 Q5) rather than failing the batch.
  */
object LiveGeocode {

  case class GeoInfo(countryCode: String, countryName: String,
      regionCode: String, regionName: String, city: String,
      lat: Double, lon: Double)

  /** The service client boundary. Real implementations wrap an HTTP
    * client (e.g. the ipstack GET of geocode.js:59); tests inject fakes.
    * Must be constructible on executors — hence the factory. */
  trait GeoClient extends Serializable {
    def lookup(ip: String): Option[GeoInfo]
  }

  /** True rolling-window rate limiter: every acquisition is timestamped
    * and at most `perWindow` of them can fall inside any rolling window
    * of `windowNanos` — unlike a fixed-window bucket, which admits up to
    * 2× the limit across a window boundary. Per-thread (one instance per
    * partition); the service-level rate is enforced by bounding lookup
    * parallelism in [[buildGeoDimension]]. */
  private final class RollingLimiter(perWindow: Int,
      windowNanos: Long = 1000000000L) {
    private val times = new java.util.ArrayDeque[Long]()
    def acquire(): Unit = {
      var now = System.nanoTime()
      var full = true
      while (full) {
        while (!times.isEmpty && now - times.peekFirst() >= windowNanos)
          times.pollFirst()
        full = times.size() >= perWindow
        if (full) {
          val wait = windowNanos - (now - times.peekFirst())
          if (wait > 0) Thread.sleep(wait / 1000000 + 1)
          now = System.nanoTime()
        }
      }
      times.addLast(now)
    }
  }

  /** Build the per-batch geo dimension from the batch's distinct public
    * source IPs. One client + cache + limiter per partition.
    *
    * `maxPerSecond` is the SERVICE-level aggregate rate: the distinct
    * IPs are coalesced into `lookupParallelism` partitions and each
    * partition's rolling-window limiter gets an equal share, so the
    * total in-flight rate never exceeds the quota regardless of cluster
    * size (the reference had the mirror-image problem: one sequential
    * request stream, decorator/index.js:166-177). */
  def buildGeoDimension(ips: Dataset[String], clientFactory: () => GeoClient,
      maxPerSecond: Int = 50, cacheSize: Int = 10000,
      lookupParallelism: Int = 4): DataFrame = {
    val spark = ips.sparkSession
    import spark.implicits._
    val parts = math.max(1, math.min(lookupParallelism, maxPerSecond))
    val perPartition = math.max(1, maxPerSecond / parts)
    ips.distinct().repartition(parts).mapPartitions { it =>
      val client = clientFactory()
      val limiter = new RollingLimiter(perPartition)
      val cache = new java.util.LinkedHashMap[String, Option[GeoInfo]](
        16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Option[GeoInfo]]): Boolean =
          size() > cacheSize
      }
      it.flatMap { ip =>
        val hit = cache.get(ip)
        val res = if (hit != null) hit else {
          limiter.acquire()
          val r = try client.lookup(ip) catch { case _: Exception => None }
          cache.put(ip, r)
          r
        }
        res.map(g => (ip, g.countryCode, g.countryName, g.regionCode,
          g.regionName, g.city, g.lat, g.lon))
      }
    }.toDF("ip", "country_code", "country_name", "region_code",
      "region_name", "city", "latitude", "longitude")
  }

  /** The decorator with live geocoding: identical plan to
    * FlowLog.enrich, but the geo dimension is built from this batch's
    * IPs. Used from foreachBatch; `enabled=false` skips lookups entirely
    * (GEOLOCATION_ENABLED semantics) and yields blank geo columns. */
  def enrich(parsed: DataFrame, eni: DataFrame,
      clientFactory: () => LiveGeocode.GeoClient, enabled: Boolean,
      maxPerSecond: Int = 50): DataFrame = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val geo =
      if (!enabled)
        spark.emptyDataset[(String, String, String, String, String, String, Double, Double)]
          .toDF("ip", "country_code", "country_name", "region_code",
            "region_name", "city", "latitude", "longitude")
      else buildGeoDimension(
        parsed.filter(!col("error") &&
            !col("srcaddr").rlike(FlowLog.Rfc1918Regex))
          .select(col("srcaddr")).as[String],
        clientFactory, maxPerSecond)
    FlowLog.enrich(parsed, eni, geo)
  }
}
