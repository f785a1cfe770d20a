package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines (SURVEY §2.5 E4):
  * token statistics, quality scoring, stopword-profile language ID, and
  * content fingerprinting.
  *
  * All per-row logic is codegen'd built-ins / higher-order functions —
  * one narrow projection over the scan, no UDFs, no shuffles except
  * where an aggregation is the point. At 100 TB each of these is a
  * map-only pass that pipelines with the parquet scan.
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: word-piece tokens ≈ runs of letters, digits,
    * or single punctuation (the usual pre-tokenizer regex shape). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[a-z0-9])(?=[^a-z0-9])|(?<=[^a-z0-9])(?=[a-z0-9])|\\s+"),
      t => length(t) > 0))

  /** BPE-ish pre-tokenizer class counts, oracle-portable flavor: the
    * alternation `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` (letter runs, digit
    * runs, single other marks) uses only constructs Java regex and RE2
    * interpret identically — unlike [[subwordCount]]'s lookarounds,
    * which RE2-based engines reject. Map-only, codegen'd. */
  def subwordClasses(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def cnt(pat: String): Column =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast(LongType)
    df.select(
      col(idCol),
      cnt("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]").as("n_subwords"),
      cnt("[A-Za-z]+").as("n_alpha_runs"),
      cnt("[0-9]+").as("n_digit_runs"),
      cnt("[^A-Za-z0-9 ]").as("n_marks"))
  }

  /** Token statistics: counts, distinct types, mean token length. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = tokens(col(textCol))
    df.select(
      col(idCol),
      size(tok).cast(LongType).as("n_tokens"),
      size(array_distinct(tok)).cast(LongType).as("n_types"),
      length(col(textCol)).cast(LongType).as("n_chars_calc"),
      (aggregate(tok, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) /
        size(tok)).as("mean_token_len"))
  }

  /** Small public stopword profiles for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "dans", "pour"))

  private def hitCount(tok: Column, words: Seq[String]): Column =
    size(filter(tok, t => t.isin(words.map(lit(_)): _*)))

  /** Stopword-hit-rate language ID: score each profile, pick the argmax
    * (ties broken by language code order — deterministic). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = tokens(col(textCol))
    val langs = stopwords.keys.toSeq.sorted
    val scored = df.select(
      col(idCol) +: langs.map(l => hitCount(tok, stopwords(l)).cast(LongType).as(s"score_$l")): _*)
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    val guess = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("lang_guess", guess)
  }

  /** Quality signals: punctuation/digit/stopword ratios + composite
    * score in [0,1] (heavier text with sane punctuation scores higher —
    * the usual pre-filter shape for LLM corpora). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val tok = tokens(txt)
    val nChars = length(txt).cast(DoubleType)
    val punct = (nChars - length(regexp_replace(txt, "[.,!?;:]", ""))).cast(DoubleType)
    val digits = (nChars - length(regexp_replace(txt, "[0-9]", ""))).cast(DoubleType)
    val stopHits = hitCount(tok, stopwords("en")).cast(DoubleType)
    df.select(
      col(idCol),
      nChars.as("n_chars_calc"),
      (punct / nChars).as("punct_ratio"),
      (digits / nChars).as("digit_ratio"),
      (stopHits / size(tok)).as("stopword_ratio"),
      least(lit(1.0), size(tok).cast(DoubleType) / 100).as("length_score"))
  }

  /** Column-level language guess (argmax stopword-profile hit count,
    * ties by language code order, 'und' when no profile hits). */
  private def langGuessCol(tok: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => hitCount(tok, stopwords(l)))
    val best = scores.reduce((a, b) => greatest(a, b))
    langs.zip(scores).foldRight(lit("und")) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** The canonical pre-training corpus filter: keep documents in the
    * target language whose quality signals clear the given floors — the
    * composition of [[langId]] and [[qualityScore]] a real pipeline runs
    * before tokenization, as ONE map-only projection (no join between
    * the two signal frames); the filter rides the scan. */
  def qualityFilter(
      df: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minTokens: Int = 20,
      maxPunctRatio: Double = 0.15, minStopwordRatio: Double = 0.01): DataFrame = {
    val txt = col(textCol)
    val tok = tokens(txt)
    val nChars = length(txt).cast(DoubleType)
    val punctRatio =
      (nChars - length(regexp_replace(txt, "[.,!?;:]", ""))).cast(DoubleType) / nChars
    val stopRatio = hitCount(tok, stopwords("en")).cast(DoubleType) / size(tok)
    val lengthScore = least(lit(1.0), size(tok).cast(DoubleType) / 100)
    df.select(col(idCol), langGuessCol(tok).as("lang_guess"),
        punctRatio.as("punct_ratio"), stopRatio.as("stopword_ratio"),
        lengthScore.as("length_score"))
      .filter(col("lang_guess") === lang &&
        col("length_score") >= math.min(1.0, minTokens / 100.0) &&
        col("punct_ratio") <= maxPunctRatio &&
        col("stopword_ratio") >= minStopwordRatio)
  }

  /** Content fingerprint: md5 of the case-folded text — the exact-dup
    * key for E1 at scale (hash once, group by 16 bytes, never by the
    * full text). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol).cast(BinaryType)).as("fp"),
      length(col(textCol)).cast(LongType).as("n_chars_calc"))

  /** Rolling-hash shingle fingerprint (winnowing-lite): the minimum
    * shingle hash per document — cheap near-dup prefilter. Not oracle-
    * declarable (xxhash64 is engine-specific); covered by tests. */
  def minShingleHash(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3): DataFrame =
    df.select(col(idCol),
      array_min(transform(Dedup.shingles(col(textCol), shingleWidth),
        s => xxhash64(s))).as("min_shingle_hash"))
}
