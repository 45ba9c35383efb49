package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the large-scale training-data pipeline
  * surface: tokenization, quality signals, language ID, fingerprinting.
  *
  * Everything is built from codegen'd Spark built-ins (split /
  * regexp_extract_all / higher-order array functions) — no UDFs, so the
  * whole text pipeline stays inside whole-stage codegen and scales with
  * the scan.
  *
  * Portability note: content hashes go through md5 (identical across
  * engines) rather than Spark's xxhash64/hash (engine-specific seeds), so
  * every derived operator (minhash, simhash, rolling fingerprints) is
  * exactly reproducible outside Spark — which is also what makes the
  * DuckDB differential oracle possible.
  */
object TextFns {

  /** Whitespace tokens (the reference-grade tokenizer). */
  def tokensWs(text: Column): Column = split(text, "\\s+")

  /** BPE-ish regex tokens: letter runs, single digits, single
    * punctuation — a deterministic stand-in for a real BPE vocab. */
  val BpeTokenRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenRe), lit(0))

  /** Portable 60-bit content hash: first 15 hex digits of md5 → long.
    * Stable across engines, partitionings and runs. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[hash60]] reduced mod (2^31 − 1): small enough that k×h+b stays
    * far from long overflow in minhash/rolling-hash arithmetic (engines
    * disagree on overflow behavior — Spark wraps, DuckDB errors). */
  def hash31(c: Column): Column = hash60(c) % 2147483647L

  /** Stopword marker sets per language (tiny, deterministic — enough for
    * an n-gram-free heuristic language ID). */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"))

  /** Number of tokens contained in `words` (counted with multiplicity). */
  def tokenHitCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** Characteristic character trigrams per language — the classic n-gram
    * profile approach (Cavnar & Trenkle), cut to the highest-frequency
    * trigrams so the whole profile stays a compile-time literal. Space-
    * padded entries capture word boundaries ("he " ≠ "he" mid-word),
    * which is what lets short or code-mixed docs classify without any
    * full stopword hit — the weakness of the token-level heuristic. */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he ", " th", "ing", "ng ", "and", "nd ", " an",
      " of", "of ", "ed ", " to", "to ", "ion", " in", "is "),
    "de" -> Seq("der", "die", "und", "ein", "ich", "sch", "ung", "cht",
      " ge", "gen", "ber", "ten", "ver", "nen", "ste", "ier"),
    "fr" -> Seq("les", "ent", "que", " qu", "ue ", "est", "ait", "eur",
      "tio", "ons", "our", "ais", "oir", "eau", "ant", " la"),
    "es" -> Seq("ión", "ado", "que", " qu", "los", "las", "ara", " co",
      "con", "ien", "sta", "cia", "nte", "una", "par", "del"))

  /** Total occurrences of a language's profile trigrams in `lowerText`
    * (already lower-cased), counted by literal replace — a pure map-side
    * expression chain (no explode, no join, no shuffle): occurrences of
    * trigram t = (len − len(text without t)) / 3. Greedy non-overlapping
    * replace semantics are identical in Spark and DuckDB, so the count
    * mirrors exactly. */
  def trigramHits(lowerText: Column, lang: String): Column =
    TrigramProfiles.toMap.apply(lang).map { tri =>
      ((length(lowerText) - length(replace(lowerText, lit(tri), lit(""))))
        .cast("long") / lit(3L)).cast("long")
    }.reduce(_ + _)

  /** PII redaction patterns, applied in order — shared by the Spark
    * scrub and the generated oracle SQL. Conservative common-subset
    * regex (no lookaround, no backreferences), so Java regex and RE2
    * agree on every match. Order matters: URLs first (an email-shaped
    * userinfo inside a URL must not survive as <EMAIL>), then emails,
    * IPv4, phone numbers. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    // leading \b (between the optional '+' and the first digit) keeps
    // the match anchored at a digit-run START: without it, a 12-digit
    // account number would match from its 3rd digit and half-redact
    ("phone", "\\+?\\b\\d{3}[-. ]?\\d{3}[-. ]?\\d{4}\\b", "<PHONE>"))

  /** (scrubbed text, per-category redaction counts in [[PiiPatterns]]
    * order). Each count is measured on the text AFTER the previous
    * categories were redacted, so nested matches attribute to exactly
    * one category. Pure regexp_replace/extract chain — codegen'd,
    * map-side, no UDF. */
  def piiScrub(text: Column): (Column, Seq[(String, Column)]) =
    PiiPatterns.foldLeft((text, Seq.empty[(String, Column)])) {
      case ((cur, counts), (name, pat, repl)) =>
        val n = size(regexp_extract_all(cur, lit(pat), lit(0))).cast("long")
        (regexp_replace(cur, pat, repl), counts :+ (name -> n))
    }

  /** Count of punctuation characters (fixed class, both engines). */
  val PunctRe = "[.,!?;:]"
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctRe, ""))

  /** Normalized exact-dedup fingerprint — ONE definition shared by the
    * batch pass (TextDedup.exactByFingerprint) and the streaming ingest
    * (CorpusIngest): the two must dedup on the same key, or the
    * documented batch-compaction-catches-what-streaming-missed invariant
    * silently breaks. */
  def contentFingerprint(text: Column): Column = md5(lower(trim(text)))

  /** The combined quality score — ONE definition shared by
    * t2_text_quality (reporting) and d9_keep_best_per_cluster (ranking):
    * stopword ratio 0.4 + capped avg-token-length 0.3 +
    * (1 − punctuation ratio) 0.3, every ratio a single division. */
  def qualityScore(text: Column): Column = {
    val toks = tokensWs(lower(text))
    val nToks = size(toks).cast("long")
    val sumTokLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (a, b) => a + b)
    val punctRatio = punctCount(text).cast("double") / length(text)
    val stopRatio = tokenHitCount(toks, Stopwords("en")).cast("double") / nToks
    stopRatio * 0.4 +
      least(sumTokLen.cast("double") / nToks / 10.0, lit(1.0)) * 0.3 +
      (lit(1.0) - punctRatio) * 0.3
  }

  /** Rolling polynomial fingerprint over BPE tokens:
    * fold(acc = acc×31 + hash31(tok) mod (2^31−1), acc₀ = 0). All values
    * stay < 2^36 so the arithmetic is overflow-free in every engine. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokensBpe(text), t => hash31(t)),
      lit(0L),
      (acc, h) => (acc * 31L + h) % 2147483647L)
}
