package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All per-row scalar pipelines (no shuffle at all — a pure map stage at
  * 100 TB) built from codegen'd Catalyst expressions. Arithmetic is
  * integer counts plus at most one double division per output so results
  * crosscheck bit-exactly against the DuckDB oracle.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny: the point is the operator shape (profile scoring
    * + deterministic argmax), not linguistic coverage. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que"))

  private def stopCount(w: Column, stops: Seq[String]): Column =
    size(filter(w, x => x.isin(stops.map(_.asInstanceOf[Any]): _*)))

  /** Language ID: score = stopword hits per profile, plus a CJK-character
    * count for zh; predicted = argmax with ties broken by language code
    * (struct sort — identical ordering in Spark and DuckDB). */
  def languageId(docs: DataFrame): DataFrame = {
    val w = TextHash.words(col("text"))
    val scored = docs.select(col("doc_id"), w.as("w"),
      length(regexp_replace(col("text"), "[^\\u4E00-\\u9FFF]", "")).as("s_zh"))
    val withScores = profiles.foldLeft(scored) { case (df, (lang, stops)) =>
      df.withColumn(s"s_$lang", stopCount(col("w"), stops))
    }
    val entries = profiles.map(_._1) :+ "zh"
    val ranked = array_sort(array(entries.map(l =>
      struct((-col(s"s_$l")).as("neg"), lit(l).as("lang"))): _*))
    withScores.select(col("doc_id") +:
      entries.map(l => col(s"s_$l").cast("long").as(s"s_$l")) :+
      element_at(ranked, 1).getField("lang").as("predicted"): _*)
  }

  /** Quality features: word count, average word length, punctuation and
    * stopword ratios, and a composite score. Ratios are single divisions
    * of exact ints; the composite is a fixed-order double expression. */
  def quality(docs: DataFrame): DataFrame = {
    val w = TextHash.words(col("text"))
    val en = profiles.toMap.apply("en")
    docs.select(col("doc_id"), w.as("w"), col("text"))
      .select(col("doc_id"),
        size(col("w")).as("word_count"),
        aggregate(col("w"), lit(0), (acc, x) => acc + length(x)).as("char_sum"),
        length(regexp_replace(col("text"), "[\\w\\s]", "")).as("punct_count"),
        stopCount(col("w"), en).as("stop_count"),
        length(col("text")).as("n_chars"))
      .select(col("doc_id"), col("word_count").cast("long").as("word_count"),
        (col("char_sum") / col("word_count")).as("avg_word_len"),
        (col("punct_count") / col("n_chars")).as("punct_ratio"),
        (col("stop_count") / col("word_count")).as("stopword_ratio"),
        (col("stop_count") / col("word_count") * 0.5
          + least(col("word_count") / 50.0, lit(1.0)) * 0.5).as("quality_score"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex token estimate
    * (letter runs | single digits | single punctuation marks). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
        .cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .withColumn("chars_per_token", col("n_chars") / col("bpe_tokens"))

  /** Document fingerprint: min / max / xor-fold of the 3-shingle hash set
    * (winnowing-style content signature; equal fingerprints ⇒ near-equal
    * shingle sets). Pure integer arithmetic. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val w = TextHash.words(col("text"))
    docs.select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        TextHash.hashAll(TextHash.shingles3(col("w"))).as("xs"))
      .select(col("doc_id"),
        array_min(col("xs")).as("fp_min"),
        array_max(col("xs")).as("fp_max"),
        aggregate(col("xs"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("fp_xor"),
        size(col("xs")).cast("long").as("n_shingles"))
  }
}
