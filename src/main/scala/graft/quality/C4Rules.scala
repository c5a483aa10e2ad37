package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The published C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * §2.2) — the line-level companion of [[GopherRules]]: where Gopher GATES
  * whole documents, C4 REWRITES them, keeping only lines that look like
  * prose and discarding pages with code/boilerplate markers.
  *
  * Line rules (a line is kept iff all hold):
  *   - ends in a terminal punctuation mark (`.` `!` `?` `"`);
  *   - has at least `minLineWords` words (paper: 5);
  *   - does not contain the word "javascript" (case-insensitive) — the
  *     enable-JS boilerplate marker.
  * Page rules (applied to the ORIGINAL text, per the paper):
  *   - no "lorem ipsum" (case-insensitive), no `{` (code marker);
  *   - at least `minLines` kept lines remain (paper: 3 sentences).
  *
  * Row-local array algebra over `\n` lines: zero shuffle, codegen'd,
  * stream-safe, and every rule is replayable in ANSI SQL (pq85).
  */
object C4Rules {

  final case class Params(minLineWords: Int = 5, minLines: Int = 3)

  /** Kept lines (the C4 line filter) as an array column. */
  def keptLines(text: Column, p: Params = Params()): Column =
    filter(split(text, "\n"), l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, " "), w => length(w) > 0)) >= p.minLineWords &&
        !lower(l).contains("javascript"))

  /** Full C4 clean: struct(clean_text, n_lines_kept, page_keep). The
    * cleaned text is the kept lines rejoined with `\n`; `page_keep` is the
    * document-level verdict (lorem-ipsum / brace markers checked against
    * the ORIGINAL text, minimum-lines against the cleaned one).
    */
  def c4Clean(text: Column, p: Params = Params()): Column = {
    val kept = keptLines(text, p)
    val nKept = size(kept).cast("long")
    struct(
      array_join(kept, "\n").as("clean_text"),
      nKept.as("n_lines_kept"),
      (!lower(text).contains("lorem ipsum") &&
        !text.contains("{") &&
        nKept >= p.minLines).as("page_keep"))
  }

  /** [[c4Clean]] with the kept-lines array staged ONCE per row (the
    * [[GopherRules.withMetricsAndFlags]] discipline: the Column-only struct
    * repeats the line-filter subtree in every field and again in any
    * pushed-down predicate — HOFs are interpreted, no codegen CSE). Adds
    * `outCol` = struct(clean_text, n_lines_kept, page_keep), same values
    * as [[c4Clean]] (pq85 hash-checks the family).
    */
  def withClean(
      df: org.apache.spark.sql.DataFrame,
      textCol: Column,
      p: Params = Params(),
      outCol: String = "c4"): org.apache.spark.sql.DataFrame = {
    // a caller column already named like a staging column would be silently
    // overwritten and then dropped — same guard as compactBatch's key names
    graft.operators.Compaction.requireFreshNames(
      df, Seq(textCol, textCol), Seq("__c4_text", "__c4_kept"))
    df.withColumn("__c4_text", textCol)
      .withColumn("__c4_kept", keptLines(col("__c4_text"), p))
      .withColumn(outCol, struct(
        array_join(col("__c4_kept"), "\n").as("clean_text"),
        size(col("__c4_kept")).cast("long").as("n_lines_kept"),
        (!lower(col("__c4_text")).contains("lorem ipsum") &&
          !col("__c4_text").contains("{") &&
          size(col("__c4_kept")).cast("long") >= p.minLines).as("page_keep")))
      .drop("__c4_text", "__c4_kept")
  }

  /** Gate-and-rewrite a corpus: pages passing the page rules, with
    * `textCol` replaced by the cleaned text.
    */
  def c4Filter(
      df: org.apache.spark.sql.DataFrame,
      textColName: String,
      p: Params = Params()): org.apache.spark.sql.DataFrame =
    withClean(df, col(textColName), p, "__c4")
      .filter(col("__c4.page_keep"))
      .withColumn(textColName, col("__c4.clean_text"))
      .drop("__c4")
}
