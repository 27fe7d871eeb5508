package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: quality stats,
  * token counting, stopword-based language ID, and content
  * fingerprinting. All pure codegen'd column expressions — a single
  * narrow pass over the corpus, no shuffle.
  */
object TextAnalysis {

  val WordRx = """\S+"""
  val TokenRx = """\w+|[^\w\s]"""
  val PunctRx = """[^\w\s]"""

  val Stopwords: Map[String, String] = Map(
    "en" -> """\b(the|a|and|of|to|in|is|it)\b""",
    "de" -> """\b(der|die|das|und|ist|ein|zu|den)\b""",
    "fr" -> """\b(le|la|les|et|est|un|une|des)\b""")

  private def rxCount(c: Column, rx: String): Column =
    size(regexp_extract_all(c, lit(rx), lit(0)))

  /** Per-document stats: char/word/token/punct counts, ratios, and a
    * simple [0,1] quality score. */
  def stats(documents: DataFrame): DataFrame = {
    val nChars = length(col("text"))
    val nWords = rxCount(col("text"), WordRx)
    val nTokens = rxCount(col("text"), TokenRx)
    val nPunct = rxCount(col("text"), PunctRx)
    val nStop = rxCount(col("text"), Stopwords("en"))
    val punctRatio = nPunct.cast("double") / nChars.cast("double")
    val stopRatio = nStop.cast("double") / nWords.cast("double")
    documents.select(col("doc_id"),
      nChars.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      nTokens.cast("long").as("n_tokens"),
      nPunct.cast("long").as("n_punct"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"),
      round(least(lit(1.0), nWords.cast("double") / 100.0) * 0.5 +
        least(lit(1.0), stopRatio * 4.0) * 0.5, 6).as("quality_score"))
  }

  /** Stopword-vote language ID with a deterministic argmax tie-break
    * (en ≥ de ≥ fr). */
  def languageId(documents: DataFrame): DataFrame = {
    val en = rxCount(col("text"), Stopwords("en")).cast("long")
    val de = rxCount(col("text"), Stopwords("de")).cast("long")
    val fr = rxCount(col("text"), Stopwords("fr")).cast("long")
    documents.select(col("doc_id"),
      en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"),
      when(en >= de && en >= fr, "en")
        .when(de >= fr, "de").otherwise("fr").as("predicted_lang"))
  }

  /** Content fingerprint: md5 of the normalized text (lowercase, strip
    * non-alphanumerics, collapse whitespace). */
  def fingerprint(documents: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    documents.select(col("doc_id"), md5(norm.cast("binary")).as("fingerprint"))
  }
}
