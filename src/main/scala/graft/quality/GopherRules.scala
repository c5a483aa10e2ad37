package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The published Gopher quality-rule bundle (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * table A1) — the de-facto standard heuristic document filter set that
  * every crawl-curation pipeline applies between extraction and dedup.
  * [[graft.functions.TextFunctions.quality_score]] is a scalar blend; this
  * is the per-RULE form — each rule's raw metric and its pass/fail flag —
  * so a pipeline can both gate (`gopher_keep`) and audit WHICH rule fired
  * (the funnel-diagnostics companion of pq44).
  *
  * Everything is row-local array/length algebra over `split` tokens and
  * `\n` lines: zero shuffle, codegen'd, stream-safe, and each metric is
  * replayable in ANSI SQL (the pq84 oracle recomputes all of them).
  * Ratios are rounded to 6 dp before thresholding — the repo-wide
  * fixed-point contract, so both engines compare identical values.
  */
object GopherRules {

  /** Gopher's own stop-word set (§A1.1: "contains at least two of the
    * following English words: the, be, to, of, and, that, have, with").
    */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Rule thresholds, defaulted to the paper's published values. */
  final case class Params(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopWords: Long = 2L,
      maxDupLineFrac: Double = 0.3,
      maxDupLineCharFrac: Double = 0.2)

  private def frac(num: Column, den: Column): Column =
    round(num.cast("double") / greatest(den, lit(1L)), 6)

  /** Raw rule metrics as one struct column. Words = space-split non-empty
    * tokens (newlines count as spaces); lines = non-empty `\n` segments.
    *
    * NOTE (performance): this Column-only form repeats the text/word/line
    * subtrees inside every struct field, and higher-order functions are
    * interpreted (no codegen subexpression elimination) — fine for a
    * single-field probe or a spec, but a full metrics+flags projection
    * built from it re-derives the arrays ~20× per row (measured 15 s vs
    * <1 s at sf0.1). Pipelines should use [[withMetricsAndFlags]], which
    * stages the arrays once per row and references them as attributes.
    */
  def metrics(text: Column): Column = {
    val words = filter(
      split(regexp_replace(text, "\n", " "), " "), w => length(w) > 0)
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    fields(text, words, lines, array_distinct(lines))
  }

  private def fields(
      text: Column, words: Column, lines: Column,
      distinctLines: Column): Column = {
    val nW = size(words).cast("long")
    val nL = size(lines).cast("long")
    val sumWordLen =
      aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val nHash = (length(text) - length(translate(text, "#", ""))).cast("long")
    val nEllipsis =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3 +
        (length(text) - length(translate(text, "…", "")))).cast("long")
    val nBullet = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("long")
    val nEllLine = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val nAlpha =
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(array_intersect(
      array_distinct(words), typedlit(StopWords))).cast("long")
    val lineChars =
      aggregate(lines, lit(0L), (acc, l) => acc + length(l).cast("long"))
    val distinctLineChars =
      aggregate(distinctLines, lit(0L), (acc, l) => acc + length(l).cast("long"))
    struct(
      nW.as("n_words"),
      nL.as("n_lines"),
      frac(sumWordLen, nW).as("mean_word_len"),
      frac(nHash, nW).as("hash_ratio"),
      frac(nEllipsis, nW).as("ellipsis_ratio"),
      frac(nBullet, nL).as("bullet_frac"),
      frac(nEllLine, nL).as("ellipsis_line_frac"),
      frac(nAlpha, nW).as("alpha_word_frac"),
      nStop.as("n_stopwords"),
      frac(nL - size(distinctLines).cast("long"), nL).as("dup_line_frac"),
      frac(lineChars - distinctLineChars, lineChars).as("dup_line_char_frac"))
  }

  /** Per-rule pass flags + the conjunction, over a [[metrics]] struct. */
  def flags(m: Column, p: Params = Params()): Column = {
    val okWords = m.getField("n_words").between(p.minWords, p.maxWords)
    val okMeanLen = m.getField("mean_word_len")
      .between(p.minMeanWordLen, p.maxMeanWordLen)
    val okSymbol = m.getField("hash_ratio") <= p.maxSymbolRatio &&
      m.getField("ellipsis_ratio") <= p.maxSymbolRatio
    val okBullet = m.getField("bullet_frac") <= p.maxBulletFrac
    val okEllLine = m.getField("ellipsis_line_frac") <= p.maxEllipsisLineFrac
    val okAlpha = m.getField("alpha_word_frac") >= p.minAlphaWordFrac
    val okStop = m.getField("n_stopwords") >= p.minStopWords
    val okDup = m.getField("dup_line_frac") <= p.maxDupLineFrac &&
      m.getField("dup_line_char_frac") <= p.maxDupLineCharFrac
    struct(
      okWords.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbol.as("ok_symbol_ratio"),
      okBullet.as("ok_bullet_lines"),
      okEllLine.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okStop.as("ok_stopwords"),
      okDup.as("ok_dup_lines"),
      (okWords && okMeanLen && okSymbol && okBullet && okEllLine &&
        okAlpha && okStop && okDup).as("gopher_keep"))
  }

  /** Metrics + flags with the arrays staged ONCE per row: a first
    * projection materializes the text and its word/line/distinct-line
    * arrays (CollapseProject keeps the stage — the arrays are multiply
    * referenced and not cheap to inline), the second computes every metric
    * field against those attributes, the third derives the flags from the
    * materialized metrics struct. Same values as [[metrics]]/[[flags]]
    * (pq84 hash-checks this form), ~20× less work per row.
    */
  def withMetricsAndFlags(
      df: org.apache.spark.sql.DataFrame,
      textCol: Column,
      p: Params = Params(),
      metricsCol: String = "m",
      flagsCol: String = "f"): org.apache.spark.sql.DataFrame = {
    // staging-name freshness: an input column named __gr_* would be
    // silently overwritten and dropped (the compactBatch key-name guard)
    val stagingNames = Seq("__gr_text", "__gr_words", "__gr_lines", "__gr_dlines")
    graft.operators.Compaction.requireFreshNames(
      df, stagingNames.map(_ => textCol), stagingNames)
    val staged = df
      .withColumn("__gr_text", textCol)
      .withColumn("__gr_words", filter(
        split(regexp_replace(col("__gr_text"), "\n", " "), " "),
        w => length(w) > 0))
      .withColumn("__gr_lines", filter(
        split(col("__gr_text"), "\n"), l => length(l) > 0))
      .withColumn("__gr_dlines", array_distinct(col("__gr_lines")))
    staged
      .withColumn(metricsCol, fields(
        col("__gr_text"), col("__gr_words"), col("__gr_lines"),
        col("__gr_dlines")))
      .withColumn(flagsCol, flags(col(metricsCol), p))
      .drop("__gr_text", "__gr_words", "__gr_lines", "__gr_dlines")
  }

  /** Gate a corpus: rows passing every rule, unchanged schema. */
  def gopherFilter(
      df: org.apache.spark.sql.DataFrame,
      textCol: Column,
      p: Params = Params()): org.apache.spark.sql.DataFrame =
    withMetricsAndFlags(df, textCol, p, "__gr_m", "__gr_f")
      .filter(col("__gr_f.gopher_keep"))
      .drop("__gr_m", "__gr_f")
}
