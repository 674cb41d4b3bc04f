package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2.F).
  * Everything is pure column arithmetic (whole-stage codegen, no UDFs)
  * and every operator is replicated exactly by its DuckDB oracle.
  */
object TextAnalysis {

  private def words: Column = split(col("text"), " ")

  private def countWord(w: String): Column =
    size(filter(words, x => x === lit(w)))

  /** F1: language ID — marker-word ratio heuristic (on this synthetic
    * corpus the English function words 'the'/'a' are the only markers;
    * real corpora extend the marker lists per language).
    */
  def langid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_words", size(words))
      .withColumn("en_score",
        round((countWord("the") + countWord("a")) / col("n_words").cast("double"), 4))
      .withColumn("pred", when(col("en_score") >= 0.02, lit("en")).otherwise(lit("unk")))
      .select(col("doc_id"), col("lang"), col("n_words"), col("en_score"), col("pred"))

  /** F2: quality scoring — length, lexical diversity, stopword ratio,
    * mean word length, combined into a bounded score.
    */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_words", size(words))
      .withColumn("n_uniq", size(array_distinct(words)))
      .withColumn("stop_raw",
        (countWord("the") + countWord("a")) / col("n_words").cast("double"))
      .withColumn("stop_ratio", round(col("stop_raw"), 4))
      .withColumn("uniq_ratio", round(col("n_uniq") / col("n_words").cast("double"), 4))
      .withColumn("mean_wlen",
        round((length(col("text")) - col("n_words") + 1) / col("n_words").cast("double"), 4))
      // the formula uses the *unrounded* ratios: feeding 4-decimal
      // rounded values into ×0.5 lands exactly on .00005 decimal
      // boundaries, where Spark (shortest-string HALF_UP) and DuckDB
      // (binary-double) round() disagree
      .withColumn("quality",
        round(least(lit(1.0),
          (col("n_uniq") / col("n_words").cast("double")) * 0.5
          + when(col("n_words").between(20, 400), 0.3).otherwise(0.0)
          + when((col("stop_raw") >= 0.01) && (col("stop_raw") <= 0.2), 0.2)
            .otherwise(0.0)), 4))
      .select(col("doc_id"), col("n_words"), col("n_uniq"), col("stop_ratio"),
        col("uniq_ratio"), col("mean_wlen"), col("quality"))

  /** F3: token counting — whitespace tokens and a BPE-ish regex token
    * stream (letter runs vs. non-letter singles), plus chars.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_ws", size(words))
      .withColumn("n_bpeish", size(expr("regexp_extract_all(text, '[a-z]+|[^a-z ]', 0)")))
      .withColumn("n_chars_m", length(col("text")))
      .select(col("doc_id"), col("n_ws"), col("n_bpeish"), col("n_chars_m"))

  /** F6: deterministic stratified sampling — the mechanism behind
    * training-mix construction: each source stratum keeps a different
    * fraction, chosen by a pure function of the row id so the sample
    * is reproducible across runs, partitionings and engines (Spark's
    * sampleBy is partitioning-dependent, which breaks exactly the
    * reproducibility a data pipeline audit needs). Here the selector
    * is doc_id mod 10 (ids are synthetic-uniform); at scale the same
    * plan uses a salted hash of a stable key — still one scan, no
    * shuffle before the filter.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    // strata = source groups (src0..src19 here): low-quality sources
    // keep 20%, mid 50%, the rest 80%
    val srcNum = regexp_extract(col("source"), "^src(\\d+)$", 1).cast("int")
    val keep = when(srcNum < 5, 2).when(srcNum < 10, 5).otherwise(8)
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(10)) < keep)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
  }

  /** F5: PII detection + redaction — the standard curation scrub stage
    * (emails, dashed phone numbers) as pure column regex ops: count
    * occurrences, replace with typed placeholders, flag clean docs.
    * The synthetic corpus contains no natural PII, so both engines
    * append the same deterministic contact line first — that keeps the
    * oracle's redaction check non-vacuous (every doc has exactly one
    * email and one phone to find, plus whatever the text held).
    * Patterns stay in the RE2 ∩ Java-regex dialect so Spark and DuckDB
    * match identically.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\d{3}-\\d{3}-\\d{4}"
    Tables.documents(spark, dir)
      .withColumn("t", concat(col("text"),
        lit(" contact u"), col("doc_id"), lit("@mail.example 555-867-530"),
        pmod(col("doc_id"), lit(10))))
      .withColumn("n_emails", regexp_count(col("t"), lit(email)))
      .withColumn("n_phones", regexp_count(col("t"), lit(phone)))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"), phone, "<PHONE>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("redacted"),
        (col("n_emails") + col("n_phones") === 2).as("clean_after_inject"))
  }

  /** F4: document fingerprint — Karp–Rabin rolling hash over 5-word
    * windows; the fingerprint is the minimum window hash (winnowing
    * with a single global window). Word code uses first/last char +
    * length so the DuckDB oracle can reproduce it bit-for-bit.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val M = 1000000007L
    val B = Array(1L, 131L, 131L * 131, 131L * 131 * 131, 131L * 131 * 131 * 131)
    def code(w: Column): Column =
      ascii(substring(w, 1, 1)) * 961 + ascii(substring(w, -1, 1)) * 31 + length(w)
    // materialize the split + per-word codes ONCE: referencing a
    // `split(...)` expression inside the window lambda would inline a
    // fresh split per element_at — 5 per window — turning this into
    // O(doc_len²) per document (measured 240s → <1s at sf0.1)
    val w = col("__w")
    val winHash = transform(sequence(lit(1), size(w) - 4),
      i => (0 until 5).map(k =>
        element_at(col("__codes"), i + k) * B(k)).reduce(_ + _) % M)
    // the <5-words guard is a *pre-projection* row filter: filtering on
    // the computed fp instead pushes the whole (inlined) fingerprint
    // expression into the scan predicate and evaluates it twice —
    // measured 57s vs <1s at sf0.1
    Tables.documents(spark, dir)
      .filter(size(words) >= 5)
      .withColumn("__w", words)
      .withColumn("__codes", transform(w, x => code(x).cast("long")))
      .withColumn("fp", array_min(winHash))
      .select(col("doc_id"), col("fp"))
  }
}
