package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One Public Suffix List rule, parsed from the publicsuffix.org file
  * format (https://publicsuffix.org/list/ — public spec):
  *   - `key`: the rule's labels, lowercased. Wildcard rules keep their
  *     literal `*.` prefix ("*.ck"); exception rules store the labels
  *     WITHOUT the `!` ("www.ck") and carry `kind = Exception`.
  *   - `kind`: [[Psl.Normal]] / [[Psl.Wildcard]] / [[Psl.Exception]].
  *   - `nlabels`: label count of the rule (the `*` counts as one).
  */
final case class PslRule(key: String, kind: Int, nlabels: Int)

/** A parsed Public Suffix List with the FULL published matching algorithm
  * (https://publicsuffix.org/list/ §"Algorithm"):
  *
  *   1. a rule matches a host when the host ends in the rule's labels,
  *      `*` matching exactly one (non-empty position) label;
  *   2. among matching rules, an EXCEPTION rule prevails; its public
  *      suffix is the rule minus its leftmost label;
  *   3. otherwise the matching rule with the MOST labels prevails;
  *   4. no rule matches ⇒ the implicit default rule `*` (the bare TLD is
  *      the public suffix).
  *   The registrable domain is the public suffix plus one more host
  *   label; a host that IS (or is shorter than) its public suffix passes
  *   through whole — the pass-through contract of
  *   [[graft.functions.UrlFunctions.url_registrable_domain]], which this
  *   generalizes (a rule table of plain 2-label suffixes reproduces the
  *   pinned-subset heuristic exactly; UrlCurationSpec proves it).
  *
  * Spark shape ([[withRegistrableDomain]]): the rule table is bounded
  * (~10k rows for the real PSL) and rides BROADCAST hash joins — one
  * probe join per (rule depth × {exact, wildcard}) candidate form, ≤
  * 2·maxDepth small joins in total, every one map-side. The corpus never
  * shuffles and nothing leaves whole-stage codegen except the join
  * probes themselves, so the operator is a row-local enrichment at any
  * corpus size — the 100 TB posture a per-domain crawl cap keys off.
  * (The depth fan-out is why this is joins rather than one `isin`: the
  * real PSL has 5-label rules — `s3.dualstack.ap-northeast-1.amazonaws
  * .com` — and wildcard/exception rows the flat-suffix probe form
  * cannot express.)
  */
final class Psl private[pipeline] (val rules: Seq[PslRule]) extends Serializable {

  require(rules.nonEmpty, "empty public-suffix rule set")
  /** Deepest rule in the table — bounds the candidate fan-out. */
  val maxDepth: Int = rules.map(_.nlabels).max
  require(maxDepth <= 8,
    s"rule depth $maxDepth exceeds the supported bound of 8 labels")

  /** Adds `outCol` = registrable domain of `hostCol` under the full PSL
    * algorithm. Null/empty hosts pass through unchanged.
    */
  def withRegistrableDomain(
      df: DataFrame,
      hostCol: Column,
      outCol: String = "domain"): DataFrame = {
    val spark = df.sparkSession
    val tempNames = Seq("__psl_h", "__psl_l", "__psl_n") ++
      (1 to maxDepth).map(d => s"__psl_x$d") ++
      (2 to maxDepth).map(d => s"__psl_w$d")
    graft.operators.Compaction.requireFreshNames(
      df, tempNames.map(_ => hostCol), tempNames)

    // one row per exact key; if a key is both a normal rule and an
    // exception rule the exception prevails (rule 2 of the algorithm),
    // and collapsing them keeps the left joins row-preserving
    val exactByKey: Map[Int, Seq[(String, Int)]] = rules
      .filter(_.kind != Psl.Wildcard)
      .groupBy(_.key).map { case (k, rs) =>
        (k, rs.map(_.kind).max, rs.head.nlabels)
      }.toSeq.groupBy(_._3).view
      .mapValues(_.map(t => (t._1, t._2))).toMap
    val wildKeys: Map[Int, Seq[String]] = rules
      .filter(_.kind == Psl.Wildcard)
      .groupBy(_.nlabels).view.mapValues(_.map(_.key).distinct).toMap

    import spark.implicits._
    // the label array is STAGED once per row (an attribute, not a
    // re-derived split inside each of the up-to-2·maxDepth join keys)
    val labels = col("__psl_l")
    val n = col("__psl_n")
    // last k labels of the host as a dotted string (CaseWhen evaluates
    // lazily, so the negative-index slice never runs on a short host)
    def lastK(k: Int): Column =
      when(n >= k, array_join(slice(labels, -k, k), "."))

    // the algorithm's first step lowercases the host; rules are stored
    // lowercased by parse()
    val base = df
      .withColumn("__psl_h", lower(hostCol))
      .withColumn("__psl_l", split(col("__psl_h"), "\\."))
      .withColumn("__psl_n", size(col("__psl_l")))
    val joined0 = (1 to maxDepth).foldLeft(base) { (d0, dpt) =>
      exactByKey.get(dpt) match {
        case Some(ks) =>
          val t = broadcast(ks.toDF("__psl_k", "__psl_t"))
          d0.join(t, lastK(dpt) === col("__psl_k"), "left")
            .withColumnRenamed("__psl_t", s"__psl_x$dpt").drop("__psl_k")
        case None => d0.withColumn(s"__psl_x$dpt", lit(null).cast("int"))
      }
    }
    val joined = (2 to maxDepth).foldLeft(joined0) { (d0, dpt) =>
      wildKeys.get(dpt) match {
        case Some(ks) =>
          val t = broadcast(ks.toDF("__psl_wk"))
          d0.join(t,
              concat(lit("*."), lastK(dpt - 1)) === col("__psl_wk") &&
                n >= dpt, "left")
            .withColumn(s"__psl_w$dpt", col("__psl_wk").isNotNull)
            .drop("__psl_wk")
        case None => d0.withColumn(s"__psl_w$dpt", lit(false))
      }
    }

    def maxOf(cols: Seq[Column]): Column =
      if (cols.isEmpty) lit(null).cast("int") else cols.reduce(greatest(_, _))
    val excD = maxOf((1 to maxDepth).map(d =>
      when(col(s"__psl_x$d") === Psl.Exception, lit(d))))
    val normD = maxOf((1 to maxDepth).map(d =>
      when(col(s"__psl_x$d") === Psl.Normal, lit(d))))
    val wildD = maxOf((2 to maxDepth).map(d =>
      when(col(s"__psl_w$d"), lit(d))))
    val ps = when(excD.isNotNull, excD - 1)
      .otherwise(coalesce(greatest(normD, wildD), lit(1)))
    joined
      .withColumn(outCol,
        when(n > ps,
          array_join(slice(labels, (lit(0) - ps - 1), ps + 1), "."))
          .otherwise(col("__psl_h")))
      .drop(tempNames: _*)
  }
}

object Psl {
  val Normal = 0
  val Wildcard = 1
  val Exception = 2

  /** Parse the publicsuffix.org file format: `//` comment lines and blank
    * lines are skipped, each remaining line is read up to its first
    * whitespace (the spec's rule), lowercased; `!` marks an exception
    * rule, a leading `*.` a wildcard rule. Both ICANN and PRIVATE section
    * rules are kept (callers who want ICANN-only can pre-filter the
    * lines). The file carries rules in ASCII/punycode or Unicode label
    * form — hosts must be matched in the SAME form they were listed
    * ([[graft.functions.UrlFunctions.url_canonicalize]] folds hosts to
    * ASCII/punycode, matching the canonical PSL distribution).
    */
  def parse(lines: IterableOnce[String]): Psl = {
    val rules = lines.iterator
      .map(_.trim.takeWhile(c => !c.isWhitespace).toLowerCase(java.util.Locale.ROOT))
      .filter(l => l.nonEmpty && !l.startsWith("//") && l != "*")
      .map { l =>
        if (l.startsWith("!"))
          PslRule(l.drop(1), Exception, l.drop(1).split("\\.", -1).length)
        else if (l.startsWith("*."))
          PslRule(l, Wildcard, l.split("\\.", -1).length)
        else PslRule(l, Normal, l.split("\\.", -1).length)
      }.distinct.toSeq
    new Psl(rules)
  }

  /** [[parse]] over a 1-column DataFrame of rule lines (a bounded
    * metadata collect: the full PSL is ~10k rows — driver-side rules are
    * what lets the plan pre-split the table per depth and broadcast each
    * slice).
    */
  def fromRuleLines(rulesDf: DataFrame): Psl =
    parse(rulesDf.collect().iterator.map(r => Option(r.getString(0)).getOrElse("")))

  /** A pinned sample of the real Public Suffix List exercising every rule
    * class the file format defines — normal 1/2-label registries, deep
    * exact suffixes up to 5 labels, wildcard and exception rules (the
    * `ck` and `kawasaki.jp`/`kobe.jp` families are the spec's own
    * examples), and private-section entries. A production deployment
    * passes the full downloaded file through [[parse]]/[[fromRuleLines]].
    */
  val SampleRules: Seq[String] = Seq(
    "// ===BEGIN ICANN DOMAINS===",
    "com", "org", "net", "io", "biz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "ac.jp", "ad.jp", "aichi.jp", "tokyo.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "ck", "*.ck", "!www.ck",
    "au", "com.au", "net.au", "org.au", "edu.au",
    "us", "k12.ak.us", "cc.ak.us",
    "// ===END ICANN DOMAINS===",
    "// ===BEGIN PRIVATE DOMAINS===",
    "amazonaws.com", "s3.amazonaws.com",
    "s3.dualstack.ap-northeast-1.amazonaws.com",
    "*.compute.amazonaws.com",
    "github.io",
    "// ===END PRIVATE DOMAINS===")

  /** [[SampleRules]], parsed. */
  lazy val sample: Psl = parse(SampleRules)
}
