package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions, UrlFunctions}
import graft.pipeline.WebCuration

/** URL-level crawl curation queries (round 16, second half): the
  * zero-document-I/O front of the training pipeline — canonical-URL dedup,
  * domain blocklists, per-domain caps. The documents table has no URL
  * column, so each query synthesizes a deterministic messy URL per doc (the
  * pq73 wrap-then-recover pattern): mixed-case scheme/host, default ports,
  * `www.`, tracking parameters, fragments, trailing slashes — and the
  * operator must normalize them identically in both engines.
  */
object CrawlQueries {

  /** One pattern source, two engines: the oracle replays the canonicalize
    * chain from the SAME constants [[UrlFunctions]] compiles into the plan.
    */
  private val pfx   = UrlFunctions.AuthorityPrefixRe
  private val hostRe = UrlFunctions.HostRe
  private val trackRe = UrlFunctions.TrackingParamRe
  private val suffixIn =
    UrlFunctions.MultiLabelSuffixes.map(s => s"'$s'").mkString(", ")

  /** DuckDB replay of [[UrlFunctions.url_canonicalize]] over column `u`. */
  private def oCanon(u: String): String =
    s"""regexp_replace(regexp_replace(
          regexp_replace(
          regexp_replace(
          regexp_replace(
          regexp_replace(
          regexp_replace(
          regexp_replace(
            lower(regexp_extract(regexp_replace(trim($u), '#.*$$', ''), '$pfx', 0))
              || regexp_replace(regexp_replace(trim($u), '#.*$$', ''), '$pfx', ''),
            '^(https?://)www\\.', '\\1'),
            '^(http://[^/:?#]+):80([/?#]|$$)', '\\1\\2'),
            '^(https://[^/:?#]+):443([/?#]|$$)', '\\1\\2'),
            '$trackRe', '\\1', 'g'),
            '([?&])&+', '\\1', 'g'),
            '[?&]+$$', ''),
          '/+\\?', '?'), '/+$$', '')"""

  /** DuckDB replay of [[UrlFunctions.url_registrable_domain]] over a
    * labels-list column `p` and host column `h`.
    */
  private def oDomain(h: String, p: String): String =
    s"""CASE WHEN len($p) <= 2 THEN $h
             WHEN array_to_string(list_slice($p, len($p)-1, len($p)), '.') IN ($suffixIn)
               THEN array_to_string(list_slice($p, len($p)-2, len($p)), '.')
             ELSE array_to_string(list_slice($p, len($p)-1, len($p)), '.') END"""

  val all: Seq[Q] = Seq(
    // ---- URL crawl curation flagship: synthesize a messy URL per doc
    // (4 deterministic families: uppercase host + default port + tracking
    // params; duplicate-path blog posts with click ids + fragments; a
    // blocklisted tracker domain; a docs site with page-number dups) →
    // canonical-URL dedup (keep min doc_id) → registrable-domain blocklist
    // (broadcast anti join) → per-domain cap of 10 by quality score
    // (bounded top_k_by heap — never a corpus window sort). Hash-exact:
    // the oracle replays the full canonicalize chain, the PSL-subset
    // domain logic, the election, the blocklist and the capped ranking.
    Q(
      "pq83_url_curation",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val id = col("doc_id")
        val url = when(id % 4 === 0, concat(
            lit("https://WWW.News.Example.CO.UK:443/Story/"), id,
            lit("/?utm_source=rss&utm_medium=feed")))
          .when(id % 4 === 1, concat(
            lit("HTTP://Blog.Example.COM:80/posts/"), id % 50,
            lit("?id="), id % 50, lit("&fbclid=abc"), id, lit("#section2")))
          .when(id % 4 === 2, concat(
            lit("https://spam.tracker.biz/offer/"), id % 10, lit("/")))
          .otherwise(concat(
            lit("https://docs.example.com/guide?page="), id % 20,
            lit("&utm_campaign=x&ref_src=tw")))
        val blocked = s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row("tracker.biz")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "domain", org.apache.spark.sql.types.StringType))))
        WebCuration.curateCrawl(
          d.withColumn("url", url), id, col("url"),
          TextFunctions.quality_score(col("text")), blocked, cap = 10)
      },
      Some(s"""
        WITH u0 AS (
          SELECT doc_id, text,
            CASE
              WHEN doc_id % 4 = 0 THEN 'https://WWW.News.Example.CO.UK:443/Story/' || doc_id || '/?utm_source=rss&utm_medium=feed'
              WHEN doc_id % 4 = 1 THEN 'HTTP://Blog.Example.COM:80/posts/' || (doc_id % 50) || '?id=' || (doc_id % 50) || '&fbclid=abc' || doc_id || '#section2'
              WHEN doc_id % 4 = 2 THEN 'https://spam.tracker.biz/offer/' || (doc_id % 10) || '/'
              ELSE 'https://docs.example.com/guide?page=' || (doc_id % 20) || '&utm_campaign=x&ref_src=tw'
            END AS url
          FROM documents),
        c8 AS (SELECT doc_id, text, ${oCanon("url")} AS canon_url FROM u0),
        hn AS (SELECT *, lower(regexp_extract(canon_url, '$hostRe', 1)) AS h FROM c8),
        rd AS (SELECT doc_id, text, canon_url,
                      ${oDomain("h", "p")} AS domain
               FROM (SELECT *, string_split(h, '.') AS p FROM hn)),
        ded AS (
          SELECT r.* FROM rd r
          JOIN (SELECT md5(canon_url) AS uh, min(doc_id) AS kid
                FROM rd GROUP BY 1) k
            ON md5(r.canon_url) = k.uh AND r.doc_id = k.kid),
        blk AS (SELECT * FROM ded WHERE domain NOT IN ('tracker.biz')),
        sc AS (
          SELECT doc_id, domain, canon_url, $oQualityScore AS score
          FROM (SELECT doc_id, domain, canon_url, text,
                       string_split(text, ' ') AS toks FROM blk)),
        tot AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_total
                FROM sc GROUP BY 1),
        rk AS (
          SELECT doc_id, domain, canon_url, score,
                 row_number() OVER (PARTITION BY domain
                                    ORDER BY score DESC, doc_id) AS rnk
          FROM sc)
        SELECT r.domain, CAST(r.rnk AS INT) AS rank, r.doc_id, r.score,
               t.n_total, r.canon_url
        FROM rk r JOIN tot t USING (domain)
        WHERE r.rnk <= 10
      """)))

  private def oQualityScore: String = PipelineQueries.oQualityScore
}
