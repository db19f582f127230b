package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines
  * (north-star extension beyond the reference surface; SURVEY.md §7.2 M6).
  *
  * Everything here is pure `Column` expression composition — codegen'd,
  * no UDFs, embarrassingly parallel per row: the shapes survive 100 TB
  * unchanged because they add no shuffle.
  */
object TextFunctions {

  /** Whitespace tokens. Single-space split (keeps parity with engines
    * whose `string_split` is literal, and with the fixtures' single-spaced
    * text).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Unicode NFC normalization (compiled [[UnicodeFunctions.NfcNormalize]]
    * expression; DuckDB-oracle-exact vs `nfc_normalize`).
    */
  def nfcNormalize(text: Column): Column = UnicodeFunctions.nfc_normalize(text)

  /** Canonical form for exact/near dedup keys: NFC (fold precomposed vs
    * combining-mark spellings) → lowercase → collapse runs of
    * `[ \t\n\r\f]` to one space → trim. The whitespace class is written
    * EXPLICITLY (not `\s`) because Java's `\s` includes U+000B while
    * RE2's does not — the explicit class keeps the literal shareable
    * with the DuckDB oracle (t14 gate). Pure Column composition: stays
    * in codegen, no shuffle.
    */
  def canonicalizeForDedup(text: Column): Column =
    trim(
      regexp_replace(
        lower(UnicodeFunctions.nfc_normalize(text)),
        "[ \\t\\n\\r\\f]+",
        " "))

  /** Token count via regex — robust to repeated whitespace. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("[^ ]+"))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * punctuation — the usual pre-tokenizer regex shape.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))

  /** Word k-shingles (for MinHash / Jaccard dedup). */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0)) ),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))
    )
  }

  /** Distinct word k-shingles as a set (first-occurrence order), computed
    * by the compiled [[HashExpressions.ShingleSet]] kernel — the HOF form
    * `array_distinct(wordShingles(text, k))` is two interpreted passes per
    * row on the dedup verify path. [[shingleSetHof]] is the equivalence
    * oracle for the kernel's ScalaTest gate.
    */
  def shingleSet(text: Column, k: Int): Column =
    HashExpressions.shingle_set(text, k)

  /** The interpreted HOF formulation of [[shingleSet]], kept only as the
    * equivalence oracle for the compiled kernel's ScalaTest gate.
    */
  def shingleSetHof(text: Column, k: Int): Column =
    array_distinct(wordShingles(text, k))

  /** Fraction of word n-grams that are repeats of an earlier n-gram in
    * the same doc — the Gopher-style within-doc repetition signal (high
    * values flag boilerplate/spam for quality filtering). Computed
    * without materializing the full n-gram array: total n-gram count is
    * arithmetic on the token count, distinct count comes from the
    * compiled [[shingleSet]] kernel. Docs of ≤ n tokens have one
    * whole-text shingle → fraction 0.
    */
  def repeatedNgramFraction(text: Column, n: Int): Column = {
    val total = greatest(size(tokens(text)) - (n - 1), lit(1)).cast("double")
    // size() of a NULL array is -1 (non-ANSI), which would compute an
    // impossible 2.0 for NULL text — propagate NULL instead (matches
    // what the same arithmetic yields in ANSI engines)
    when(text.isNull, lit(null).cast("double"))
      .otherwise((total - size(shingleSet(text, n)).cast("double")) / total)
  }

  /** Composite quality-filter predicate (Gopher-style rule stack): keep
    * docs that are long enough, lexically diverse, and not repetitive.
    * Pure per-row arithmetic over [[tokens]], [[typeTokenRatio]], and
    * [[repeatedNgramFraction]] — codegen'd, no shuffle; thresholds are
    * corpus-tuning knobs, the defaults match common pre-training
    * filters. Compose with further conjuncts (`lang`, markers, length
    * caps) at the call site.
    */
  def qualityPredicate(
      text: Column,
      minTokens: Int = 20,
      minTypeTokenRatio: Double = 0.5,
      maxRepeatedBigrams: Double = 0.2
  ): Column =
    size(tokens(text)) >= minTokens &&
      typeTokenRatio(text) >= minTypeTokenRatio &&
      repeatedNgramFraction(text, 2) <= maxRepeatedBigrams

  /** PII scrub patterns shared by [[redactPii]] and its oracle SQL: the
    * regexes stay inside the Java-regex ∩ RE2 common subset (character
    * classes, bounded repetition, ASCII `\b`) so Spark and DuckDB apply
    * them identically.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b" -> "<PHONE>"
  )

  /** Training-data PII scrub: replace emails, IPv4 addresses, and
    * phone-shaped digit runs with typed tokens. A chain of codegen'd
    * `regexp_replace`s — per-row, no shuffle, order fixed (emails first
    * so address-like digit runs inside them can't half-match).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }

  // ----------------------------------------------------------- URLs

  /** URL-shaped spans in running text. Stops at whitespace and the
    * quote/bracket characters that delimit links in prose and markup;
    * trailing sentence punctuation is NOT trimmed (a curation pipeline
    * wanting that applies its own policy). All three patterns live in
    * the Java-regex ∩ RE2 subset and are shared verbatim with the
    * DuckDB oracle SQL (t13 generates the SQL from these constants).
    */
  val urlPattern: String =
    "(?i)\\bhttps?://[^ \\t\\n\\r<>\\x22\\x27\\)\\]]+" // \x22 \x27 = " ' (keeps the literal SQL-embeddable); \r too or CRLF corpora embed it

  /** scheme://[userinfo@]HOST[:port] — group 1 is the host. */
  val urlHostPattern: String =
    "(?i)^[a-z][a-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]+)"

  /** The leading scheme://authority span (group 0), for case folding. */
  val urlSchemeHostPattern: String = "(?i)^[a-z][a-z0-9+.-]*://[^/?#]*"

  /** Tracking query parameters stripped by [[normalizeUrl]]. */
  val urlTrackingParam: String = "(?:utm_[a-zA-Z0-9_]*|fbclid|gclid)"

  /** Every URL-shaped span in `text`, in order (array of strings). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Lowercased host of a URL, '' when the input is not URL-shaped. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, urlHostPattern, 1))

  /** Canonicalize a URL for dedup keys: drop the #fragment, drop
    * tracking parameters (utm_*, fbclid, gclid) wherever they sit in
    * the query string, and lowercase the whole scheme://authority
    * prefix — host and scheme are case-insensitive per RFC 3986; the
    * rare userinfo@ is folded with them, a documented trade for staying
    * regex-only. Path and query case are significant and preserved. A
    * chain of per-row codegen'd regexps — URL dedup at corpus scale is
    * then an exact groupBy on the normalized key, no parsing library
    * involved.
    */
  def normalizeUrl(url: Column): Column = {
    // sentinel chain, no backreferences (Spark uses $1 where DuckDB
    // uses \1 — a backref would break the shared-literal oracle):
    // rewrite '?' to '?&' so EVERY param is &-anchored, strip anchored
    // tracking params, undo the sentinel, drop an emptied-out query.
    // A literal '?' inside the query string also gets the sentinel
    // treatment — rare, and consistently applied on both engines and
    // both sides of any dedup comparison, which is what a key needs.
    // An unanchored strip corrupts params whose NAME merely contains a
    // tracking name (?xutm_a=1&b=2 → ?xb=2) — the anchor is load-bearing.
    val noFragment = regexp_replace(url, "#.*", "")
    val sentinel = regexp_replace(noFragment, "\\?", "?&")
    val stripped =
      regexp_replace(sentinel, "&(?:" + urlTrackingParam + ")=[^&]*", "")
    val unsentinel = regexp_replace(stripped, "\\?&", "?")
    val noEmptyQuery = regexp_replace(unsentinel, "\\?$", "")
    concat(
      lower(regexp_extract(noEmptyQuery, urlSchemeHostPattern, 0)),
      regexp_replace(noEmptyQuery, urlSchemeHostPattern, "")
    )
  }

  /** Strip HTML markup to text: drop script/style blocks wholesale
    * (their content is code, not prose), remove remaining tags and
    * comments, decode the half-dozen named entities that dominate real
    * corpora, and collapse the whitespace the removals leave behind.
    * Step 0 of web-corpus curation, as a codegen'd regexp chain — the
    * patterns live in the Java-regex ∩ RE2 subset so the oracle applies
    * identical expressions. This is the fast scrub for overwhelmingly-
    * text pages, not a DOM parser: boilerplate extraction (readability
    * scoring, main-content detection) is a different, model-shaped
    * problem.
    */
  /** The HTML-strip replace chain, shared VERBATIM with the t09 and p11
    * oracle SQL (SparkEntry generates both by folding over this Seq —
    * hand-duplicating it forked the chains once, round-11 review):
    * one pass per block tag (a combined script|style alternation would
    * let a dangling <script> be "closed" by the next </style> — RE2 has
    * no backreferences to pin the closer to the opener); comments;
    * tags; entities with &amp; decoded LAST (earlier would turn
    * &amp;lt; into &lt; and then double-decode it to <); then a
    * space-run collapse. [[stripHtml]] applies the chain and trims.
    */
  val htmlStripSteps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ",
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&",
    " +" -> " "
  )

  def stripHtml(text: Column): Column =
    trim(htmlStripSteps.foldLeft(text) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    })

  /** MD5 document fingerprint (engine-portable exact-dup key). */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Polynomial rolling hash over characters: h = (h*31 + code) mod p.
    * Sequential left-to-right — order-sensitive, unlike MD5 of the
    * whole string this is cheap to compute incrementally at scale.
    * Computed by the compiled [[HashExpressions.RollingHash64]] kernel:
    * the HOF form (`aggregate(split(text, ""), ...)`) allocates an array
    * element per character and evaluates interpreted — the compiled
    * expression is one pass over the string inside whole-stage codegen.
    */
  def fingerprintRolling(text: Column): Column =
    HashExpressions.rolling_hash64(text)

  /** The interpreted HOF formulation of [[fingerprintRolling]], kept only
    * as the equivalence oracle for the compiled kernel's ScalaTest gate.
    */
  def fingerprintRollingHof(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L
    )

  /** Occurrences of a marker word (space-delimited) in the text. */
  def markerCount(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val marker = s" $word "
    (length(padded) - length(replace(padded, lit(marker), lit("")))) /
      lit(marker.length)
  }

  /** Per-language marker words (public high-frequency function words). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo")
  )

  /** Marker-word score for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(w => markerCount(text, w)).reduce(_ + _)

  /** N-gram-heuristic language ID: argmax of per-language marker scores,
    * ties resolved by fixed language order, zero score → "und".
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(best <= 0, "und")) {
      case (acc, (lang, s)) => acc.when(s === best, lang)
    }
    chain.otherwise("und")
  }

  /** Quality metrics as individual columns: character count, token count,
    * type-token ratio, mean token length, stopword ratio, punctuation
    * count. Composable into any scoring formula downstream.
    */
  def nChars(text: Column): Column = length(text)

  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    size(array_distinct(toks)).cast("double") / size(toks)
  }

  /** Mean token length, built-ins only. For a literal single-space split
    * the summed token lengths are exactly `length(text) − (n_tokens − 1)`
    * — each of the n−1 separators consumes one character and empty tokens
    * contribute zero — which replaces the interpreted
    * `aggregate(transform(toks, length), ...)` fold (CodegenFallback, the
    * per-row interpreted-hot-loop class) with codegen'd arithmetic.
    */
  def meanTokenLength(text: Column): Column = {
    val n = size(tokens(text))
    (length(text) - (n - lit(1))).cast("double") / n
  }

  def stopwordRatio(text: Column): Column =
    langScore(text, langMarkers.head._2) / tokenCount(text)

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]"))

  // ----------------------------- Gopher rule metrics (Rae et al. 2021)

  /** Fraction of words containing at least one ASCII letter (Gopher
    * keeps docs with ≥ 0.8). Codegen formulation: prefix one space so
    * every word starts at a space, then count words whose prefix up to
    * the first letter stays within the word — the regex consumes the
    * rest of the word, so matches are one-per-word (an interpreted
    * `filter(toks, rlike)` HOF would be CodegenFallback in the hot
    * path; see [[meanTokenLength]] for the pattern).
    */
  def alphaWordFraction(text: Column): Column =
    regexp_count(concat(lit(" "), text), lit(" [^ ]*[A-Za-z]"))
      .cast("double") / size(tokens(text))

  /** Hash-and-ellipsis density per word (Gopher drops docs above 0.1):
    * (# occurrences + non-overlapping "..." occurrences) / words.
    */
  def symbolWordRatio(text: Column): Column =
    (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
      .cast("double") / size(tokens(text))

  /** Stopword hits against the built-in English marker list (Gopher
    * requires ≥ 2) — integer-valued double, shared with [[langScore]].
    */
  def stopwordCount(text: Column): Column =
    langScore(text, langMarkers.head._2)

  /** The word-level Gopher rule stack as one codegen'd predicate. Line
    * rules (bullet/ellipsis line fractions) need line structure the
    * single-line corpus contract doesn't carry and are deliberately
    * omitted. Every component is individually oracle-proven (t02 mean
    * length, t12 the rest), so threshold flips are engine-identical —
    * the ratios are IEEE results of identical integer operations.
    */
  def gopherPredicate(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanTokenLen: Double = 3.0,
      maxMeanTokenLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFraction: Double = 0.8,
      minStopwords: Int = 2
  ): Column = {
    val n = size(tokens(text))
    val mean = meanTokenLength(text)
    n.between(minWords, maxWords) &&
    mean.between(minMeanTokenLen, maxMeanTokenLen) &&
    symbolWordRatio(text) <= maxSymbolRatio &&
    alphaWordFraction(text) >= minAlphaFraction &&
    stopwordCount(text) >= minStopwords
  }
}
