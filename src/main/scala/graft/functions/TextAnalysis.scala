package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * language ID (marker-word n-gram heuristic), quality scoring, token
  * counting (whitespace + BPE-ish lexer regex), and document
  * fingerprinting (normalized content hash).
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs —
  * so whole-stage codegen spans the full pipeline and the same definitions
  * are mechanically rendered to oracle SQL (single source of truth for both
  * engines; see the `*Sql` methods).
  *
  * Scale: all per-row expressions, embarrassingly parallel, no shuffle.
  * Only arithmetic portable across engines is used (+ * / round, regex) —
  * no exp/ln whose libm bits differ.
  */
object TextAnalysis {

  // ── shared constants (drive BOTH the Spark exprs and the oracle SQL) ───
  val stopwordsEn: Seq[String] =
    Seq("the", "and", "of", "to", "in", "a", "is", "that", "it", "for")

  /** Marker stopwords per language; zh is scored by CJK codepoint count. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  val hanPattern = "[\\x{4e00}-\\x{9fff}]" // valid in both Java regex and RE2
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  val punctPattern = "[.,;:!?()-]"
  val alphaPattern = "[A-Za-z]"

  def wordPattern(ws: Seq[String]): String = "\\b(" + ws.mkString("|") + ")\\b"

  /** PII patterns, written to the Java-regex ∩ RE2 common subset so Spark
    * and the DuckDB oracle match identical spans (no lookarounds, no
    * backreferences, literal `-` only at class edges).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,}"

  /** Engine-portable half-up rounding for non-negative doubles:
    * floor(x·10ˢ + 0.5)/10ˢ — every step an exact IEEE op evaluated
    * identically by any engine. `round()` is NOT portable: Spark rounds
    * the shortest decimal representation, DuckDB the binary value, and
    * they split at .…5 boundaries (observed at sf0.1, not sf0.01 — the
    * boundary needs enough rows to get hit).
    */
  private def halfUp(x: Column, scale: Int): Column = {
    val m = math.pow(10, scale) // powers of ten ≤ 1e15 are exact doubles
    floor(x * m + 0.5) / m
  }
  private def halfUpSql(x: String, scale: Int): String =
    s"(floor(($x) * 1e$scale + 0.5) / 1e$scale)"

  // ── Spark column forms ─────────────────────────────────────────────────
  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish token count: letter runs + digit runs + lone symbols. */
  def tokenCountBpe(c: Column): Column = countMatches(c, bpePattern)

  def punctRatio(c: Column): Column =
    halfUp(countMatches(c, punctPattern).cast("double") / length(c), 6)

  def alphaRatio(c: Column): Column =
    halfUp(countMatches(c, alphaPattern).cast("double") / length(c), 6)

  def stopwordRatio(c: Column): Column =
    halfUp(countMatches(lower(c), wordPattern(stopwordsEn)).cast("double") /
      tokenCountWs(c), 6)

  /** Composite quality score in [0,1]-ish: stopword density + letter
    * density - punctuation noise. Deliberately linear (portable bits).
    */
  def qualityScore(c: Column): Column =
    halfUp(stopwordRatio(c) * lit(0.5) + alphaRatio(c) * lit(0.3) +
      (lit(1.0) - punctRatio(c)) * lit(0.2), 4)

  /** Language ID: marker-word counts per language, CJK script beats all,
    * deterministic priority order on ties (en > es > de > fr).
    */
  def langScores(c: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, ws) =>
      l -> countMatches(lower(c), wordPattern(ws))
    } :+ ("zh" -> countMatches(c, hanPattern))

  def langId(c: Column): Column = {
    val s = langScores(c).toMap
    when(s("zh") > 0, "zh")
      .when(s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("de") && s("es") >= s("fr"), "es")
      .when(s("de") >= s("fr"), "de")
      .otherwise("fr")
  }

  // ── Gopher quality rules (Rae et al. 2021, §A1.1 — all-public) ─────────
  // The published pretraining filter bundle, re-expressed so every
  // threshold is an INTEGER cross-multiplication (mean word length in
  // [3,10] becomes 3·n_words ≤ word_chars ≤ 10·n_words, etc.) — no float
  // ever compared, so the keep decision is bit-portable by construction.
  // The reference corpus has no line structure, so the line-based rules
  // (bullet/ellipsis line ratios) are out of scope here; the word-level
  // rules are the load-bearing ones.

  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** `#` occurrences and ellipses — Gopher's "symbol" tokens. */
  val gopherSymbolPattern = "#|\\.\\.\\."

  /** Total non-whitespace characters — the mean-word-length numerator. */
  def gopherWordChars(c: Column): Column =
    length(regexp_replace(c, "\\s+", ""))

  /** Words containing at least one letter (the ≥ 80 % alphabetic rule). */
  def gopherAlphaWords(c: Column): Column =
    size(filter(split(trim(lower(c)), "\\s+"), w => w.rlike("[a-z]")))

  def gopherSymbols(c: Column): Column = countMatches(c, gopherSymbolPattern)

  /** DISTINCT Gopher stopwords present (the ≥ 2 marker-word rule). */
  def gopherStopHits(c: Column): Column =
    gopherStopwords.map(w =>
      when(lower(c).rlike("\\b" + w + "\\b"), 1).otherwise(0))
      .reduce(_ + _)

  /** The keep decision from the stat columns — pure integer comparisons:
    * word count in [minWords, maxWords], mean word length in [3, 10]
    * (3·n ≤ chars ≤ 10·n), symbol-to-word ratio ≤ 1/10 (10·sym ≤ n),
    * alphabetic-word share ≥ 4/5 (5·alpha ≥ 4·n), ≥ 2 distinct marker
    * stopwords.
    */
  def gopherKeep(nWords: Column, wordChars: Column, alphaWords: Column,
      symbols: Column, stopHits: Column,
      minWords: Int, maxWords: Int): Column =
    nWords.between(minWords, maxWords) &&
      lit(3) * nWords <= wordChars && wordChars <= lit(10) * nWords &&
      lit(10) * symbols <= nWords &&
      lit(5) * alphaWords >= lit(4) * nWords &&
      stopHits >= 2

  /** Canonical-form fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5 — the rolling-hash-style doc identity used
    * for fuzzy-exact dedup.
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " ")))

  /** Winnowing fingerprints (Schleimer-Wilkerson-Aiken SIGMOD'03, the
    * MOSS algorithm — all public): slide a window of `w` consecutive
    * k-gram hashes over the lowercased text and keep each window's
    * minimum (ties broken LEFTMOST — deterministic, and replayable by
    * DuckDB's first-occurrence `list_position`). The selected set has
    * the winnowing guarantee: any shared substring of length ≥ w+k-1
    * yields a shared fingerprint, at expected density 2/(w+1) — the
    * local-fingerprint robustness the single whole-document
    * [[fingerprint]] lacks.
    *
    * Entirely NARROW: hashes, windows, minima, and the dedup all happen
    * inside one native expression per row
    * ([[WinnowFingerprints]], an O(n) monotonic-deque loop — the
    * composed transform/slice/array_min formulation is semantically
    * identical but runs interpreted at O(n·w) and was the bench board's
    * slowest row) — zero shuffle; fingerprints hash through the portable
    * 60-bit md5 prefix so the oracle replays them exactly. Texts shorter
    * than k chars hash as one whole-string gram; fewer than w grams
    * collapse to one whole-text window (both engines truncate slices
    * identically). Returns `array<struct<fp: bigint, pos: bigint>>` —
    * pos is the 1-based character offset of the selected k-gram.
    */
  def winnow(text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"need k >= 1, got $k")
    require(w >= 1, s"need w >= 1, got $w")
    call_function("winnow_fps", text, lit(k), lit(w))
  }

  /** Blocklist hit counts — ONE Aho–Corasick walk counts every
    * (overlapping) occurrence of all `patterns` at once
    * ([[MultiMatchCounts]]); returns `array<bigint>` aligned with the
    * pattern order. Case handling is the caller's (pass `lower(c)` and
    * lower-cased patterns for case-insensitive gating). Narrow, no
    * shuffle — the banned-phrase gate pipelines into any scan.
    */
  def blocklistCounts(c: Column, patterns: Seq[String]): Column =
    call_function("multi_match", (c +: patterns.map(lit)): _*)

  /** PII scrub — the redaction pass every shared training corpus needs
    * before release: masks emails then phone numbers with typed
    * placeholders. Two codegen'd regexp_replace passes, narrow, no
    * shuffle — scrubbing is free to pipeline into any scan.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  // ── identical logic rendered as DuckDB SQL (oracle side) ───────────────
  private def cnt(expr: String, pattern: String): String =
    s"len(regexp_extract_all($expr, '$pattern'))"

  def tokenCountWsSql(c: String): String =
    s"len(regexp_split_to_array(trim($c), '\\s+'))"

  def tokenCountBpeSql(c: String): String = cnt(c, bpePattern)

  def punctRatioSql(c: String): String =
    halfUpSql(s"${cnt(c, punctPattern)}::DOUBLE / length($c)", 6)

  def alphaRatioSql(c: String): String =
    halfUpSql(s"${cnt(c, alphaPattern)}::DOUBLE / length($c)", 6)

  def stopwordRatioSql(c: String): String =
    halfUpSql(s"${cnt(s"lower($c)", wordPattern(stopwordsEn))}::DOUBLE / ${tokenCountWsSql(c)}", 6)

  def qualityScoreSql(c: String): String =
    halfUpSql(s"${stopwordRatioSql(c)} * 0.5 + ${alphaRatioSql(c)} * 0.3 + " +
      s"(1.0 - ${punctRatioSql(c)}) * 0.2", 4)

  def langIdSql(c: String): String = {
    val s = (langMarkers.map { case (l, ws) =>
      l -> cnt(s"lower($c)", wordPattern(ws))
    } :+ ("zh" -> cnt(c, hanPattern))).toMap
    s"CASE WHEN ${s("zh")} > 0 THEN 'zh' " +
      s"WHEN ${s("en")} >= ${s("es")} AND ${s("en")} >= ${s("de")} AND ${s("en")} >= ${s("fr")} THEN 'en' " +
      s"WHEN ${s("es")} >= ${s("de")} AND ${s("es")} >= ${s("fr")} THEN 'es' " +
      s"WHEN ${s("de")} >= ${s("fr")} THEN 'de' ELSE 'fr' END"
  }

  def gopherWordCharsSql(c: String): String =
    s"length(regexp_replace($c, '\\s+', '', 'g'))"

  def gopherAlphaWordsSql(c: String): String =
    s"len(list_filter(regexp_split_to_array(trim(lower($c)), '\\s+'), " +
      "w -> regexp_matches(w, '[a-z]')))"

  def gopherSymbolsSql(c: String): String = cnt(c, gopherSymbolPattern)

  def gopherStopHitsSql(c: String): String =
    gopherStopwords.map(w =>
      s"CASE WHEN regexp_matches(lower($c), '\\b$w\\b') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  def gopherKeepSql(n: String, chars: String, alpha: String, sym: String,
      stop: String, minWords: Int, maxWords: Int): String =
    s"($n BETWEEN $minWords AND $maxWords AND 3 * $n <= $chars AND " +
      s"$chars <= 10 * $n AND 10 * $sym <= $n AND 5 * $alpha >= 4 * $n AND " +
      s"$stop >= 2)"

  /** DuckDB twin of [[winnow]] — identical hash, window, and
    * leftmost-min semantics via list lambdas, WITHOUT the per-row dedup
    * (this DuckDB build cannot `list_distinct` a struct list): callers
    * unnest and apply relational DISTINCT, which lands on the same rows
    * as the engine's `array_distinct`.
    */
  def winnowSql(c: String, k: Int, w: Int): String = {
    val h = (g: String) => s"('0x' || substring(md5($g), 1, 15))::BIGINT"
    s"""list_transform([lower($c)], t ->
       |  list_transform([list_transform(range(1, greatest(length(t) - ${k - 1}, 1) + 1),
       |                                 i -> ${h(s"substring(t, i, $k)")})], hh ->
       |    list_transform(range(1, greatest(len(hh) - ${w - 1}, 1) + 1),
       |      j -> list_transform([list_slice(hh, j, j + ${w - 1})], s ->
       |             {'fp': list_min(s),
       |              'pos': CAST(j - 1 + list_position(s, list_min(s)) AS BIGINT)})[1])
       |  )[1]
       |)[1]""".stripMargin
  }

  def fingerprintSql(c: String): String =
    s"md5(trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))"

  def scrubPiiSql(c: String): String =
    s"regexp_replace(regexp_replace($c, '$emailPattern', '<EMAIL>', 'g'), " +
      s"'$phonePattern', '<PHONE>', 'g')"
}
