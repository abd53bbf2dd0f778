package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language ID, fingerprinting.
  *
  * Beyond-reference scope (SURVEY §7 M9): the reference only touches text
  * via sentiment scoring (`adi/app/ingestion_service/ml_utils.py`); these
  * are the text-side operators a 100 TB document pipeline needs. Everything
  * is a pure column expression — codegen-friendly, no UDFs, no shuffles.
  */
object TextAnalysis {

  /** Whitespace tokenization (the BPE-ish regex split). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(toks: Column): Column = size(toks)

  /** Sum of token lengths via aggregate HOF (exact integer arithmetic). */
  def charCount(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  def avgTokenLen(toks: Column): Column =
    charCount(toks).cast("double") / nullif(size(toks), lit(0))

  def uniqueTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / nullif(size(toks), lit(0))

  /** Count of tokens contained in a (small, broadcast-as-literal) word set. */
  def wordSetCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  val StopwordsEn = Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "mit", "von", "ein", "zu", "den")
  val StopwordsFr = Seq("le", "la", "les", "et", "des", "un", "une", "est", "du", "dans")
  val StopwordsEs = Seq("el", "los", "las", "y", "de", "un", "una", "es", "por", "con")

  def stopwordRatio(toks: Column, words: Seq[String] = StopwordsEn): Column =
    wordSetCount(toks, words).cast("double") / nullif(size(toks), lit(0))

  /** Document quality score in [0,1]: blend of stopword presence, token
    * diversity, and a length band — the length/punct/stopword-ratio
    * heuristic family used by LLM-corpus cleaners. Deterministic integer /
    * per-row double arithmetic only. */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val lengthOk = when(n >= 10 && n <= 10000, lit(1.0)).otherwise(lit(0.0))
    lit(0.4) * least(stopwordRatio(toks) * 5.0, lit(1.0)) +
      lit(0.4) * uniqueTokenRatio(toks) +
      lit(0.2) * lengthOk
  }

  /** N-gram-heuristic language ID: CJK char presence → zh, else argmax of
    * per-language stopword hits with a fixed preference order (en, de, fr,
    * es) for ties, "und" (undetermined) when no set matches. */
  def langId(text: Column, toks: Column): Column = {
    val sEn = wordSetCount(toks, StopwordsEn)
    val sDe = wordSetCount(toks, StopwordsDe)
    val sFr = wordSetCount(toks, StopwordsFr)
    val sEs = wordSetCount(toks, StopwordsEs)
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(sEn === 0 && sDe === 0 && sFr === 0 && sEs === 0, lit("und"))
      .when(sEn >= greatest(sDe, sFr, sEs), lit("en"))
      .when(sDe >= greatest(sFr, sEs), lit("de"))
      .when(sFr >= sEs, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Rolling polynomial fingerprint of the token stream, mod 2^31-1 —
    * order-sensitive (permuted documents fingerprint differently). Modular
    * arithmetic keeps every intermediate below 2^36, safe under ANSI
    * overflow checking. */
  def fingerprint(toks: Column): Column = {
    val M = 2147483647L // 2^31 - 1
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(M)), lit(M)))
  }
}
