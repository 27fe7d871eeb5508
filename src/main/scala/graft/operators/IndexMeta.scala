package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** One-row JSON sidecar for persisted index layouts (`_graft_meta
  * .json` — underscore-prefixed, so parquet directory listings ignore
  * it like `_SUCCESS`): records the build parameters an index's serve
  * leg must match, and lets the serve FAIL LOUDLY on a mismatched
  * config instead of silently joining disjoint keyspaces (the repo's
  * non-convergence discipline, applied to build/serve coupling).
  * Written through the Hadoop FileSystem API so the sidecar lands on
  * whatever filesystem the index does. */
private[graft] object IndexMeta {
  private val Name = "_graft_meta.json"

  // JSON string escaping, both directions: a parameter value holding
  // a quote or backslash (a custom LSH `sep`, say) must round-trip
  // exactly — an unescaped write would produce a sidecar whose regex
  // parse silently drops or mangles fields, and requireMatch would
  // then compare against garbage, defeating the loud-mismatch
  // contract it exists for.
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unesc(s: String): String =
    """\\(.)""".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(m.group(1)))

  def write(spark: SparkSession, dir: String,
      fields: (String, String)*): Unit = {
    val path = new Path(dir, Name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(fields
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): Map[String, String] = {
    val path = new Path(dir, Name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path),
      s"no $Name under $dir — not a graft index layout (or an index " +
        "built before meta sidecars; rebuild it)")
    val in = fs.open(path)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // Token = any run of non-quote chars or escaped chars, so an
    // escaped quote stays inside its field instead of ending it.
    """"((?:[^"\\]|\\.)+)":"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(txt)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }

  /** Fail unless every `expected` key matches the stored value. */
  def requireMatch(spark: SparkSession, dir: String,
      expected: (String, String)*): Unit = {
    val got = read(spark, dir)
    expected.foreach { case (k, v) =>
      require(got.get(k).contains(v),
        s"index at $dir was built with $k=" +
          s"${got.getOrElse(k, "<absent>")} but the serve requested " +
          s"$k=$v — serve with the build config or rebuild the index")
    }
  }
}
