package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Text-analysis operators for training-data curation: quality scoring,
  * language identification, token accounting, fingerprinting. All pure
  * column expressions over the document table — one narrow projection, no
  * shuffle, trivially scalable.
  */
object TextOps {

  /** Per-language stopword regexes (word-boundary alternations — identical
    * semantics in Java regex and RE2, so the oracle can mirror them).
    */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|and|of|to|in|is)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "fr" -> "\\b(le|les|et|est|dans|une)\\b",
    "es" -> "\\b(el|los|y|es|en|una)\\b")

  /** Quality features: length, token count, mean token length, stopword /
    * digit ratios, and a deterministic composite score.
    */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = size(Text.tokens(t))
    val avgTokLen = (nChars - nTokens + 1).cast("double") / nTokens
    val stopCount = Text.patternCount(lower(t), stopwords.head._2)
    val stopRatio = stopCount.cast("double") / nTokens
    val digitRatio = (nChars - length(regexp_replace(t, "[0-9]", ""))).cast("double") / nChars
    val score = least(lit(1.0), greatest(lit(0.0),
      lit(0.2) + stopRatio * 2.0 + avgTokLen * 0.05 - digitRatio * 3.0))
    df.select(col(idCol), nChars.as("n_chars"), nTokens.as("n_tokens"),
      stopCount.as("n_stopwords"), avgTokLen.as("avg_token_len"),
      stopRatio.as("stop_ratio"), digitRatio.as("digit_ratio"),
      score.as("quality_score"))
  }

  /** N-gram-heuristic language ID: stopword-hit score per language, argmax
    * with a fixed priority order; 'und' when nothing matches.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lowered = lower(col(textCol))
    val scored = stopwords.foldLeft(df) { case (d, (lang, pat)) =>
      d.withColumn(s"s_$lang", Text.patternCount(lowered, pat))
    }
    val langs = stopwords.map(_._1)
    val best = langs.map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("und"): Column) { (l, els) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(els)
    }
    scored.select(col(idCol) +: langs.map(l => col(s"s_$l")) :+ pred.as("lang_pred"): _*)
  }

  /** Document fingerprint census: canonical-content md5 per document. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
}
