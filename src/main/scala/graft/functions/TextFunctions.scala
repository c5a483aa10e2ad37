package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines: token
  * stats, quality scoring, language ID, fingerprinting. All are pure column
  * expressions (codegen'd by Catalyst, no UDFs) and all are engine-portable:
  * the same computation is expressible in ANSI-ish SQL for the oracle.
  */
object TextFunctions {

  /** Portable 60-bit content hash: first 15 hex chars of md5, as a long.
    * Chosen over Murmur3 because every SQL engine computes the identical
    * value — this is the hash family underlying the minhash/simhash dedup
    * operators, where cross-engine verifiability matters more than the last
    * 20% of hashing speed.
    */
  def portable_hash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens (corpus text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def token_count(text: Column): Column = size(tokens(text))

  /** Punctuation chars among `.,!?;:` — translate() keeps semantics identical
    * across engines (no regex dialect drift).
    */
  def punct_count(text: Column): Column =
    length(text) - length(translate(text, ".,!?;:", ""))

  /** Heuristic quality score in [0,1]: stopword hit-rate, length saturation,
    * punctuation cleanliness. Deterministic double arithmetic (fixed
    * expression shape, no reordering).
    */
  def quality_score(text: Column): Column = {
    // ONE native byte pass for both counts: size(split(...)) allocated the
    // whole token array to count it, and the stopword filter was an
    // interpreted lambda doing |stopwords| compares per token — this is the
    // per-document hot path of every mix flagship's scored stage. Counts
    // are value-identical to the declarative forms (TextFunctionsSpec),
    // so the score (and every oracle hash) is unchanged.
    val counts = graft.functions.toColumn(graft.plans.TokenStopCountsExpr(
      graft.functions.toExpr(text), Stopwords.en))
    val n = counts.getField("n_tokens").cast("double")
    val stop = counts.getField("n_stop").cast("double")
    val punct = punct_count(text).cast("double")
    // empty text: n is never 0 (split('') = ['']), but length IS — guard the
    // char division so an all-scrubbed doc scores 0.303 instead of raising
    // ANSI DIVIDE_BY_ZERO (the oracle fragment mirrors the guard)
    val chars = greatest(length(text), lit(1)).cast("double")
    round(
      lit(0.4) * (stop / n) +
      lit(0.3) * least(n / lit(100.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - punct / chars), 6)
  }

  /** Argmax over (score, code): max by score, lexicographically-last code
    * wins ties — the same (s, l) tuple comparison DuckDB's list_max applies,
    * so both language-ID variants and their oracles agree on every tie.
    */
  private def argmaxLang(scored: Seq[(Column, String)]): Column =
    array_max(array(scored.map { case (s, code) =>
      struct(s.as("s"), lit(code).as("l"))
    }: _*)).getField("l")

  /** N-gram-free language ID: stopword-list voting with alphabetical
    * tiebreak. (A character-n-gram model is the production upgrade; the
    * operator contract — text in, ISO code out — is the same.)
    */
  def lang_guess(text: Column): Column = {
    val toks = tokens(text)
    def score(words: Seq[String]): Column = size(filter(toks, t => t.isin(words: _*)))
    argmaxLang(Seq(
      score(Stopwords.de) -> "de",
      score(Stopwords.en) -> "en",
      score(Stopwords.es) -> "es",
      score(Stopwords.fr) -> "fr"))
  }

  /** All character n-grams of the text with multiplicity (positions
    * 1..len-n+1; shorter texts yield their single clamped substring — the
    * same clamping rule as SQL substr, so engines agree on edge cases).
    * Shared by language ID (n=3) and minhash shingling (n=shingleSize).
    */
  def char_ngrams(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  def char_trigrams(text: Column): Column = char_ngrams(text, 3)

  /** Character-n-gram language ID — the production-shaped upgrade of
    * [[lang_guess]]: score = number of DISTINCT text trigrams found in each
    * language's frequent-trigram profile (hash-set intersection, not a
    * per-element isin chain), argmax wins with the same (score, code) tuple
    * comparison in both engines.
    *
    * Implementation: "profile trigram ∈ the text's distinct-trigram set" is
    * exactly "profile trigram is a substring of the text" (a trigram occurs
    * iff some 3-char window equals it; sub-3-char texts match neither way),
    * so the score is 10 codegen'd `contains` probes per language — no
    * trigram-array materialization, no set intersection, and `contains`
    * compiles to an indexOf the JIT vectorizes. Bit-identical to the
    * intersection form ([[lang_guess_ngram_pre]], kept as the declarative
    * twin / oracle shape and asserted equal in DedupSpec): profiles are
    * duplicate-free, so counting memberships equals the intersection size.
    */
  def lang_guess_ngram(text: Column): Column = {
    def score(profile: Seq[String]): Column =
      profile.map(tg => when(text.contains(lit(tg)), lit(1)).otherwise(lit(0)))
        .reduce(_ + _)
    argmaxLang(Seq(
      score(TrigramProfiles.de) -> "de",
      score(TrigramProfiles.en) -> "en",
      score(TrigramProfiles.es) -> "es",
      score(TrigramProfiles.fr) -> "fr"))
  }

  /** The text's distinct character trigrams (pre-projection for
    * [[lang_guess_ngram_pre]]).
    */
  def distinct_trigrams(text: Column): Column =
    array_distinct(char_trigrams(text))

  /** Language ID over a pre-projected [[distinct_trigrams]] column. */
  def lang_guess_ngram_pre(distinctTrigrams: Column): Column = {
    def score(profile: Seq[String]): Column =
      size(array_intersect(distinctTrigrams, array(profile.map(lit): _*)))
    argmaxLang(Seq(
      score(TrigramProfiles.de) -> "de",
      score(TrigramProfiles.en) -> "en",
      score(TrigramProfiles.es) -> "es",
      score(TrigramProfiles.fr) -> "fr"))
  }

  /** Polynomial rolling hash (base 31, mod 2^31-1) over the raw characters —
    * a portable document fingerprint. All intermediate values stay < 2^36 so
    * 64-bit arithmetic never overflows in any engine.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 2147483647L)

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken 2003, the MOSS
    * algorithm): over the document's sequence of `n`-token window hashes,
    * slide a width-`w` window and record each position's minimum hash; the
    * distinct minima are the fingerprints. Any shared run of at least
    * `w + n - 1` tokens between two documents is guaranteed to share a
    * fingerprint, with ~2/(w+1) of hashes selected. Two native expressions
    * per row (n-gram hasher → monotonic-deque sliding min,
    * [[graft.plans.SlidingMinDistinct]]) — row-local, O(tokens), zero
    * shuffles at any scale. [[declarative_winnow_fingerprints]] is the
    * retained equivalence oracle.
    */
  def winnow_fingerprints(text: Column, n: Int, w: Int): Column = {
    require(n > 0 && w > 0, s"need positive n=$n, w=$w")
    graft.functions.sliding_min_distinct(
      graft.functions.word_ngram_hashes(text, n), w)
  }

  /** The pre-native declarative winnowing form — O(n·w) with a w-array
    * allocated per window position; bit-identical to
    * [[winnow_fingerprints]] (asserted in TextFunctionsSpec), kept as the
    * equivalence oracle for the native sliding-min expression.
    */
  private[graft] def declarative_winnow_fingerprints(text: Column, n: Int, w: Int): Column = {
    val hs = graft.functions.word_ngram_hashes(text, n)
    // null-transparent like the native path: size(null) is -1, so without
    // the guard greatest(-1-w, 0) fabricates ONE window over a null array
    // and a null text came out as [null] instead of null — found by
    // NativeTwinFuzzSpec's null case
    when(hs.isNull, lit(null).cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), greatest(size(hs) - w, lit(0))),
        i => array_min(slice(hs, i + 1, lit(w))))))
  }

  /** PII patterns shared by [[redact_pii]] / [[pii_count]] and their oracle
    * SQL, which interpolates these exact strings — one source of truth, zero
    * regex-dialect drift. Written in the Java∩RE2 common subset (no
    * lookaround, no shorthand classes, metacharacters in brackets instead of
    * backslash escapes) so Spark's Java regex and DuckDB's RE2 agree
    * match-for-match. Order matters and is part of the contract: URLs before
    * emails (a URL may embed an `@`), IPs before phone-ish digit runs.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^ ]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ip", "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
    ("phone", "[+][0-9][-0-9() ]{6,}[0-9]", "<PHONE>"))

  /** Scrub PII spans, replacing each with its `<TYPE>` token — the standard
    * pre-training redaction pass. Pure `regexp_replace` chain: row-local,
    * codegen'd, zero shuffle at any scale.
    */
  def redact_pii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, lit(re), lit(tok))
    }

  /** Count of matches of one [[piiPatterns]] entry (group 0 = whole match),
    * for per-type redaction accounting.
    */
  def pii_count(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Word n-grams as strings ("w1 w2 w3"), distinct per document. */
  def word_ngrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Intra-document repetition signals — the Gopher/RefinedWeb-style quality
    * filters (duplicate-token and most-frequent-bigram fractions flag
    * boilerplate and generation loops). Per doc: token counts row-local from
    * array functions; bigram mode frequency via explode → two PARTIAL-AGG
    * shuffles (per-(doc, bigram) count, then per-doc max/sum), never a join
    * and never per-doc quadratic work — the 100 TB shape. All outputs are
    * integers so the DuckDB oracle hash-matches exactly; ratio thresholds
    * are the caller's integer cross-multiplication (e.g. repetitive ⇔
    * `top_bigram_count * 5 >= n_bigrams`).
    */
  /** Per-document top-`k` characteristic terms, tf-idf-style but in pure
    * integer ordering so the oracle hash-matches bit-exactly: rank by term
    * frequency descending, then corpus document-frequency ascending (rarer
    * term wins the tie — the idf direction), then the token itself. Floats
    * never appear, so no `ln()` rounding can drift between engines.
    *
    * 100 TB shape: explode → per-(doc, token) count and per-token df are
    * both partial-agg shuffles; the tf⋈df join sees two sides already
    * hash-partitioned by token; the final top-k is one window shuffle on
    * doc_id. The vocabulary is never collected or broadcast — it can be
    * arbitrarily large.
    */
  def topTerms(
      df: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k=$k must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(idCol.as("doc_id"), explode(tokens(textCol)).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
    tf.join(dfreq, "tok")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"))
  }

  /** RAG-style chunking: split each document into token windows of
    * `chunkSize` with `overlap` tokens shared between consecutive chunks
    * (stride = chunkSize - overlap). The trailing chunk may be shorter.
    * Entirely row-local (sequence → slice → posexplode): zero shuffles, and
    * chunk ids are (doc_id, chunk_idx) so downstream embedding stages can
    * repartition however they like.
    */
  def chunkByTokens(
      df: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      chunkSize: Int,
      overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap=$overlap < chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    val t = tokens(textCol)
    df.select(idCol.as("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(size(t) - 1, lit(0)), lit(stride)),
          i => slice(t, i + 1, lit(chunkSize)))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).as("n_tokens"))
  }

  /** Sequence packing for pre-training batches, concat-then-window style:
    * within each stratum, documents are laid out in deterministic id order
    * and the token stream is cut into `budgetTokens`-sized context windows;
    * a document's pack is the window containing its first token.
    *
    * Scale shape (strata are languages/sources — a global
    * `sum().over(Window.partitionBy(stratum).orderBy(doc_id))` would run each
    * stratum's entire prefix sum through one reducer): the classic two-phase
    * prefix sum. Ids are cut into contiguous ranges of `idsPerRange` id-space
    * each (`doc_id div idsPerRange` — truncating division is monotone, so
    * ranges preserve id order). Phase 1 computes per-range token totals with
    * a partial aggregation (map-side combined, metadata-sized result) and the
    * cumulative base offset of each range with a window over that tiny range
    * table. Phase 2 broadcast-joins the bases back and computes the row's
    * offset with a running sum inside `(stratum, range)` — a well-distributed
    * window key (~idsPerRange rows per group). Output is integer-exact and
    * identical to the single-window form, including duplicate-doc_id tie
    * handling (ties share a range, and the RANGE frame semantics match).
    * Requires numeric, non-null doc ids.
    */
  def packSequences(
      df: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      strataCol: Column,
      budgetTokens: Int,
      idsPerRange: Long = 4096L): org.apache.spark.sql.DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    require(idsPerRange > 0, s"idsPerRange=$idsPerRange must be positive")
    import org.apache.spark.sql.expressions.Window
    val t = df.select(idCol.as("doc_id"), strataCol.as("stratum"),
        token_count(textCol).cast("long").as("n_tokens"))
      .withColumn("__rng", expr(s"CAST(doc_id AS BIGINT) div ${idsPerRange}L"))
    // phase 1: per-range totals (partial-agg shuffle, tiny result) and each
    // range's cumulative base offset (window over the metadata-sized table)
    val wRng = Window.partitionBy(col("stratum")).orderBy(col("__rng"))
    val bases = t.groupBy(col("stratum"), col("__rng"))
      .agg(sum(col("n_tokens")).as("__rng_tokens"))
      .withColumn("__base", sum(col("__rng_tokens")).over(wRng) - col("__rng_tokens"))
      .select(col("stratum").as("__b_stratum"), col("__rng").as("__b_rng"),
        col("__base"))
    // phase 2: row-local offset within the range, plus the broadcast base
    val wLocal = Window.partitionBy(col("stratum"), col("__rng"))
      .orderBy(col("doc_id"))
    t.join(broadcast(bases),
        col("stratum") <=> col("__b_stratum") && col("__rng") <=> col("__b_rng"))
      .withColumn("start_offset",
        col("__base") + sum(col("n_tokens")).over(wLocal) - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_offset div ${budgetTokens.toLong}"))
      .select(col("doc_id"), col("stratum"), col("n_tokens"),
        col("start_offset"), col("pack_id"))
  }

  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column): org.apache.spark.sql.DataFrame = {
    val toks = df.select(idCol.as("doc_id"), tokens(textCol).as("t"))
    val base = toks.select(
      col("doc_id"),
      size(col("t")).as("n_tokens"),
      size(array_distinct(col("t"))).as("n_distinct_tokens"),
      when(size(col("t")) < 2, array().cast("array<string>"))
        .otherwise(expr("transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1]))"))
        .as("bg"))
    base
      // explode_outer keeps bigram-less docs (empty text, single token) as a
      // null-bigram row, so the aggregate still emits their zero counts
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        explode_outer(col("bg")).as("bigram"))
      .groupBy(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"), col("bigram"))
      .count()
      .groupBy(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"))
      .agg(
        sum(when(col("bigram").isNotNull, col("count")).otherwise(0L)).as("n_bigrams"),
        count(when(col("bigram").isNotNull, lit(1))).as("n_distinct_bigrams"),
        max(when(col("bigram").isNotNull, col("count")).otherwise(0L)).as("top_bigram_count"))
  }

  /** Crawl markup extraction (the WET step of a web pipeline): drop
    * script/style blocks wholesale, strip every remaining tag, decode the
    * five common entities (`&amp;` LAST, so `&amp;lt;` yields the literal
    * `&lt;` instead of double-decoding to `<`), collapse whitespace, trim.
    * A pure row-local regexp chain (the pq37 PII pattern) — zero shuffle,
    * codegen'd, stream-safe; every pattern is RE2-compatible so the DuckDB
    * oracle replays it verbatim.
    */
  def extract_text(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      // entity names are regex-metachar-free, so the literals ARE the
      // patterns (\Q..\E quoting would break the RE2 oracle replay)
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Main-content extraction ([[graft.plans.MainContentExpr]] — the
    * jusText/Boilerpipe-class text-density + link-density block scorer):
    * the tier between [[extract_text]] (which keeps nav bars, cookie
    * banners, footers) and the Gopher/C4 gates, so the gates judge
    * authored prose instead of boilerplate-diluted text. Returns
    * `struct(n_blocks, n_content, text_main)`; row-local, stream-safe.
    */
  def main_content(
      html: Column,
      minLen: Int = 80,
      maxLinkDensity: Double = 0.33,
      minStopFrac: Double = 0.0,
      contextPass: Boolean = true): Column =
    graft.functions.toColumn(graft.plans.MainContentExpr(
      graft.functions.toExpr(html), minLen, maxLinkDensity, minStopFrac, contextPass))

  /** Intra-document repetition REMOVAL (the CCNet/Gopher cleanup the stats
    * above only measure): the document is cut into non-overlapping
    * `segTokens`-token segments and every repeat of an already-seen segment
    * is dropped, keeping the FIRST occurrence — the boilerplate/genera-
    * tion-loop scrubber. Output: `(doc_id, n_segments, n_kept, text_clean)`.
    *
    * 100 TB shape: entirely ROW-LOCAL array algebra (split → segment →
    * keep-first filter via `array_position` → rejoin); no shuffle, no
    * state, stream-safe. Cross-document segment dedup is pq41's separate
    * operator; this one never looks outside the row.
    */
  def dropRepeatedSegments(
      df: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      segTokens: Int): org.apache.spark.sql.DataFrame =
    df.select(idCol.as("doc_id"),
        graft.functions.toColumn(graft.plans.RepeatedSegmentsExpr(
          graft.functions.toExpr(textCol), segTokens)).as("__r"))
      .select(col("doc_id"),
        col("__r.n_segments").as("n_segments"),
        col("__r.n_kept").as("n_kept"),
        col("__r.text_clean").as("text_clean"))

  /** The pre-native declarative form of [[dropRepeatedSegments]] —
    * `transform`+`slice` segments, keep-first via an `array_position`
    * filter (O(segments²) interpreted comparisons per document). Retained
    * as the independently-derived equivalence oracle for the native
    * [[graft.plans.RepeatedSegmentsExpr]] in TextFunctionsSpec.
    */
  private[graft] def dropRepeatedSegmentsDeclarative(
      df: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      segTokens: Int): org.apache.spark.sql.DataFrame = {
    require(segTokens >= 1, s"segTokens=$segTokens must be positive")
    val n = segTokens
    // null text: size(null __toks) is -1 (legacy sizeOfNull), which without
    // the greatest/when guards would make sequence(0, -1) emit a DESCENDING
    // [0,-1] and fabricate two garbage segments — instead a null doc comes
    // out honest: n_segments = 0, n_kept = 0, text_clean = ''
    val withSegs = df
      .select(idCol.as("doc_id"), split(textCol, " ").as("__toks"))
      .withColumn("__nseg",
        greatest(floor((size(col("__toks")) + lit(n - 1)) / lit(n)).cast("long"), lit(0L)))
      .withColumn("__segs",
        when(col("__nseg") > 0,
          transform(sequence(lit(0L), col("__nseg") - 1),
            i => array_join(slice(col("__toks"), (i * n + 1).cast("int"), lit(n)), " ")))
          .otherwise(array().cast("array<string>")))
    withSegs
      .withColumn("__kept",
        filter(col("__segs"), (s, i) => array_position(col("__segs"), s) === (i + 1).cast("long")))
      .select(col("doc_id"),
        size(col("__segs")).as("n_segments"),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("text_clean"))
  }
}

/** Frequent character trigrams per language (public corpus statistics,
  * ASCII-only so no encoding drift between engines).
  */
object TrigramProfiles {
  val en: Seq[String] = Seq("the", "he ", "ing", " th", "and", "ion", "tio", "of ", "nd ", "ed ")
  val de: Seq[String] = Seq("der", "die", "und", "ein", "ich", "sch", "che", "ung", "den", "ber")
  val es: Seq[String] = Seq("de ", "la ", "os ", "el ", "ue ", "nte", "ado", "ar ", "que", "aci")
  val fr: Seq[String] = Seq("le ", "les", "ent", "eur", "ait", "oir", "est", "ons", "ais", "que")
}

/** Minimal per-language stopword lists (public common words). */
object Stopwords {
  val en: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  val de: Seq[String] = Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den")
  val es: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no")
  val fr: Seq[String] = Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "ce")
}
