package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions._

/** URL-level crawl curation — the zero-document-I/O front of the pipeline:
  * canonical-URL dedup, domain blocklisting, and a per-domain document cap,
  * composable into one plan ([[curateCrawl]]). Decides what to KEEP before
  * any text is read, on columns a crawl frontier already has.
  *
  * 100 TB shape, stage by stage:
  *   1. canonical-URL dedup: canonicalization is row-local; the election is
  *      ONE partial-agg shuffle keyed by the 128-bit md5 of the canonical
  *      URL (fixed-width keys — raw URLs never shuffle), then a co-keyed
  *      join back on (hash, id), the [[Curation.curateTrainingMix]] dedup
  *      shape.
  *   2. blocklist: registrable-domain extraction is row-local label
  *      algebra; the block set (thousands of domains at most) rides a
  *      BROADCAST anti-join — the corpus never shuffles.
  *   3. per-domain cap: [[Curation.perSourceCap]]'s bounded `top_k_by`
  *      heap per domain — partial heaps merge map-side, so a hot domain
  *      (one site = 10% of the crawl, the usual skew) costs one cap-sized
  *      buffer on the wire, never a sorted partition.
  */
object WebCuration {

  /** Registrable domain against a FULL Public Suffix List (the production
    * form of [[UrlFunctions.url_registrable_domain]]): `pslDf` is a
    * 1-column DataFrame of rule LINES in the publicsuffix.org file format
    * — plain suffixes ("co.uk", "s3.dualstack.ap-northeast-1.amazonaws
    * .com"), wildcard rules ("*.ck"), exception rules ("!www.ck"),
    * comments — and the match is the published longest-match algorithm
    * ([[Psl]]). A table of plain 2-label suffixes reproduces the
    * pinned-subset heuristic exactly (UrlCurationSpec), so existing
    * suffix tables keep their meaning; wildcard registries
    * (`*.kawasaki.jp`) now SPLIT into one registrable domain per
    * sub-registry instead of pooling a whole TLD's crawl budget under
    * one key. All probes are broadcast joins — the corpus never
    * shuffles. Adds `outCol` to `df`.
    */
  def withRegistrableDomain(
      df: DataFrame,
      hostCol: Column,
      pslDf: DataFrame,
      outCol: String = "domain"): DataFrame =
    Psl.fromRuleLines(pslDf).withRegistrableDomain(df, hostCol, outCol)

  /** Registrable-domain enrichment shared by the crawl stages: the
    * pinned-subset column heuristic by default, or the FULL PSL broadcast
    * plan when a parsed rule table is supplied — both zero-corpus-shuffle,
    * so every stage below upgrades by passing `psl` through.
    */
  private def withDomain(
      df: DataFrame,
      urlCol: Column,
      psl: Option[Psl],
      outName: String): DataFrame = psl match {
    case Some(p) => p.withRegistrableDomain(df, url_host(urlCol), outName)
    case None => df.withColumn(outName, url_domain(urlCol))
  }

  /** Canonical-URL dedup election: one row per distinct canonical URL with
    * the keeper (min id) and the copy count. Same contract as
    * [[graft.dedup.Dedup.exactByCanonicalContent]], keyed on
    * [[UrlFunctions.url_canonicalize]].
    */
  def canonicalUrlDedup(df: DataFrame, idCol: Column, urlCol: Column): DataFrame =
    df.groupBy(md5(url_canonicalize(urlCol)).as("url_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Drop every row whose registrable domain appears in `blockedDomains`
    * (a 1-column DataFrame of domains). The block set is broadcast — this
    * is a filter, not a shuffle, at any corpus size. Pass `psl` to key the
    * block decision on the full-PSL registrable domain (wildcard and
    * exception registries split correctly) instead of the column
    * heuristic.
    */
  def domainBlocklist(
      df: DataFrame,
      urlCol: Column,
      blockedDomains: DataFrame,
      psl: Option[Psl] = None): DataFrame = {
    val blocked = broadcast(
      blockedDomains.toDF("__blocked_domain").dropDuplicates("__blocked_domain"))
    withDomain(df, urlCol, psl, "__rd")
      .join(blocked, col("__rd") === col("__blocked_domain"), "left_anti")
      .drop("__rd")
  }

  /** URL-level crawl curation in one plan: canonical-URL dedup (keep the
    * smallest id per canonical form) → domain blocklist → per-domain cap of
    * `cap` docs ranked by `scoreCol` descending (ties to the smaller id).
    * Output: one row per admitted doc — (domain, rank, doc_id, score,
    * n_total, canon_url); `n_total` counts the domain's post-blocklist
    * dedup survivors, so cap cuts are auditable.
    */
  def curateCrawl(
      df: DataFrame,
      idCol: Column,
      urlCol: Column,
      scoreCol: Column,
      blockedDomains: DataFrame,
      cap: Int,
      psl: Option[Psl] = None): DataFrame = {
    graft.functions.requireIntegralId(df, idCol, "curateCrawl")
    val withCanon = df.select(
      idCol.as("__id"), scoreCol.as("__score"),
      url_canonicalize(urlCol).as("canon_url"))
    val withHash = withCanon.withColumn("__uh", md5(col("canon_url")))
    // keeper key renamed: a same-lineage join key would trip Spark's
    // ambiguous-self-join detection into a trivially-true predicate
    val keepers = withHash
      .groupBy(col("__uh")).agg(min(col("__id")).as("__keep_id"))
      .select(col("__uh").as("__kuh"), col("__keep_id"))
    val deduped = withHash.join(
      keepers,
      col("__uh") === col("__kuh") && col("__id") === col("__keep_id"),
      "inner")
      .select(col("__id"), col("__score"), col("canon_url"))
    // Stage boundary: the narrow admitted table (id, score, canon_url,
    // domain — no document text) feeds TWO consumers (the cap heap and the
    // canon_url join-back); persist it once so the dedup chain executes
    // once. Lifecycle per Curation.releaseStageCaches / scopedStageCaches.
    // The registrable domain is computed ONCE (under the full PSL that is
    // a multi-join chain) and the blocklist anti-joins against the column.
    val blocked = broadcast(
      blockedDomains.toDF("__bd").dropDuplicates("__bd"))
    val admitted = Curation.persistStage(
      withDomain(deduped, col("canon_url"), psl, "domain")
        .join(blocked, col("domain") === col("__bd"), "left_anti"))
    Curation.perSourceCap(
      admitted, col("__id"), col("domain"), col("__score"), cap)
      .withColumnRenamed("source", "domain")
      .join(
        admitted.select(col("__id").as("doc_id"), col("canon_url")),
        Seq("doc_id"))
  }

  /** Streaming canonical-URL dedup: the live form of [[canonicalUrlDedup]]
    * for a crawl frontier arriving as a stream — first canonical form wins,
    * later re-crawls of the same URL (tracking-param variants, `www.`
    * mirrors, trailing-slash duplicates) drop inside the watermark horizon.
    * Canonicalization is row-local; the dedup key is the 128-bit md5 of the
    * canonical form, so state is fixed-width per URL and evicted by event
    * time (`dropDuplicatesWithinWatermark` underneath, with the batch
    * fallback for backfills — the [[graft.streaming.StreamOps]] posture).
    */
  def dedupeUrlStream(
      df: DataFrame,
      urlCol: Column,
      tsCol: String,
      watermarkDelay: String): DataFrame =
    df.withColumn("__canon_key", md5(url_canonicalize(urlCol)))
      .transform(d => graft.streaming.StreamOps.dedupeStream(
        d, Seq("__canon_key"), tsCol, watermarkDelay))
      .drop("__canon_key")

  /** URL-level crawl CDC: diff two crawl snapshots by CANONICAL URL —
    * added / removed / changed / unchanged per URL, robust to URL-form
    * churn (a page re-crawled under new tracking parameters or a `www.`
    * mirror is the SAME url, `unchanged` unless its content moved). Each
    * side is first collapsed to one row per canonical URL (content hash =
    * min of the group's md5s, deterministic under intra-snapshot URL
    * duplicates), then the [[Snapshots.diff]] shape: one co-partitioned
    * full-outer join on the canonical URL — content never shuffles, the
    * 128-bit hash stands in for it. Presence is explicit, never inferred
    * from hash nullability (null-content rows diff correctly).
    */
  def frontierDiff(
      oldCrawl: DataFrame,
      newCrawl: DataFrame,
      urlCol: Column,
      contentCol: Column): DataFrame = {
    def side(df: DataFrame, hashName: String, flagName: String) =
      df.select(url_canonicalize(urlCol).as("canon_url"),
          md5(contentCol).as("__h"))
        .groupBy(col("canon_url"))
        .agg(min(col("__h")).as(hashName))
        .withColumn(flagName, lit(true))
    side(oldCrawl, "old_hash", "__in_old")
      .join(side(newCrawl, "new_hash", "__in_new"), Seq("canon_url"), "full_outer")
      .select(col("canon_url"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("old_hash") <=> col("new_hash")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Seed a crawl frontier from parsed sitemap documents — the missing
    * half of sitemap discovery ([[graft.plans.RobotsSitemaps]] surfaces
    * the URLs; this turns them into frontier work): explode the page urls
    * of every sitemap ([[graft.functions.sitemap_urls]]), canonicalize,
    * and anti-join against the frontier's canonical urls → the DISCOVERY
    * set (urls the sitemaps advertise that the frontier has never seen).
    * Child sitemaps (`<sitemapindex>` entries) ride along in a second
    * frame so the caller can recurse fetch-parse-seed.
    *
    * Composes with [[frontierDiff]]: diffing the frontier against
    * (frontier ∪ discovery) marks exactly this set `added`
    * (UrlCurationSpec pins the equivalence). 100 TB shape: sitemap docs
    * are tiny relative to the corpus; both sides collapse to canonical-
    * url keys before the one anti-join shuffle — page content never
    * enters.
    *
    * Returns (discovery: one `canon_url` row per new url,
    * childSitemaps: one `sitemap_url` row per index entry).
    */
  def sitemapFrontierSeed(
      sitemaps: DataFrame,
      docCol: Column,
      frontier: DataFrame,
      urlCol: Column): (DataFrame, DataFrame) = {
    import graft.functions.{sitemap_children, sitemap_urls}
    val pages = sitemaps
      .select(explode(sitemap_urls(docCol)).as("__u"))
      .select(url_canonicalize(col("__u")).as("canon_url"))
      .dropDuplicates("canon_url")
    val known = frontier
      .select(url_canonicalize(urlCol).as("canon_url"))
      .dropDuplicates("canon_url")
    val discovery = pages.join(known, Seq("canon_url"), "left_anti")
    val children = sitemaps
      .select(explode(sitemap_children(docCol)).as("sitemap_url"))
      .dropDuplicates("sitemap_url")
    (discovery, children)
  }

  /** Canonical outlink edge list of a fetched-page frame — the edge half
    * of the crawl ([[graft.functions.extract_links]] →
    * [[graft.functions.resolve_url]] → `url_canonicalize`), honoring the
    * robots directives a polite crawler must: page-level
    * `<meta name="robots" content="nofollow">` drops ALL the page's
    * edges, a per-link `rel="nofollow"` (any token of the rel list)
    * drops that edge — unless `honorNofollow = false`, which keeps them
    * flagged for analysis. Unresolvable hrefs (no absolute base,
    * same-document fragments) drop row-local. Output:
    * `(src, dst, anchor, nofollow)` — canonical urls, visible anchor
    * text (the ranking/labeling signal real link graphs carry).
    *
    * Everything up to the output is ROW-LOCAL (parse, resolve,
    * canonicalize — zero shuffle, stream-safe); downstream consumers
    * aggregate it into host graphs ([[graft.pipeline.LinkRank]]) or
    * anti-join it against the frontier ([[sitemapFrontierSeed]]'s
    * discovery rule works unchanged on link edges).
    */
  def linkGraph(
      pages: DataFrame,
      urlCol: Column,
      htmlCol: Column,
      honorNofollow: Boolean = true): DataFrame = {
    import graft.functions.{extract_links, resolve_url, robots_meta}
    val edges = pages
      .select(urlCol.as("__page"),
        robots_meta(htmlCol).getField("nofollow").as("__page_nf"),
        explode(extract_links(htmlCol)).as("__l"))
      .select(
        url_canonicalize(col("__page")).as("src"),
        url_canonicalize(resolve_url(col("__page"), col("__l.href"))).as("dst"),
        col("__l.anchor").as("anchor"),
        (col("__page_nf") ||
          coalesce(array_contains(split(col("__l.rel"), "\\s+"), "nofollow"),
            lit(false))).as("nofollow"))
      .where(col("dst").isNotNull)
    if (honorNofollow) edges.where(!col("nofollow")) else edges
  }

  /** In-link anchor-text index over a [[linkGraph]] edge list — the
    * classic off-page signal: what OTHER pages call a document describes
    * it better than its own boilerplate, and every production ranking
    * stack (and label-mining pipeline) aggregates it. One partial-agg
    * shuffle on `dst`: in-link count, distinct referring sources, and the
    * SORTED anchor list (sorted so the aggregation is order-deterministic
    * under any partitioning — `collect_list` alone is not). Feeds BM25
    * (index the anchors as a field) and the frontier (high in-link urls
    * first).
    */
  def anchorTextIndex(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst"))
      .agg(
        count(lit(1)).as("n_inlinks"),
        countDistinct(col("src")).as("n_src"),
        sort_array(collect_list(col("anchor"))).as("anchors"))

  /** The crawl-scheduling flagship — WHEN × WHO × HOW-MUCH in one plan:
    * [[recrawlPriority]]'s staleness score (when the site says a url
    * changed), [[graft.pipeline.LinkRank.integerPageRank]]'s centrality
    * (who the web says matters), and a per-host fetch budget (politeness
    * — a scheduler must not let one host's backlog starve the rest).
    * `priority = round(score × (1 + rank/scale), 6)` — centrality BOOSTS
    * staleness multiplicatively (an un-ranked url keeps its staleness
    * score; a top-ranked one doubles it at rank = scale), then each
    * host's urls take `fetch_rank` 1..`perHostCap` by (priority desc,
    * url) — a PARTITIONED window: the per-host sort is partition-local
    * (host cardinality grows with the corpus, so no partition outgrows
    * its host's frontier slice; the audit's unpartitioned-window rule
    * untouched). One left join on the canonical url (fixed-width keys)
    * + one host-keyed exchange. Output:
    * `(canon_url, host, known_changed, priority, fetch_rank)`.
    */
  def fetchPlan(
      revisit: DataFrame,
      ranks: DataFrame,
      perHostCap: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(perHostCap >= 1, s"perHostCap=$perHostCap")
    val joined = revisit
      .join(ranks.select(col("node").as("canon_url"), col("rank")), Seq("canon_url"), "left")
      .withColumn("priority",
        round(col("score") *
          (lit(1.0) + coalesce(col("rank"), lit(0L)).cast("double") / scale), 6))
      .withColumn("host", graft.functions.UrlFunctions.url_host(col("canon_url")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("priority").desc, col("canon_url"))
    joined
      .withColumn("fetch_rank", row_number().over(w).cast("int"))
      .where(col("fetch_rank") <= perHostCap)
      .select(col("canon_url"), col("host"), col("known_changed"),
        col("priority"), col("fetch_rank"))
  }

  /** Published changefreq vocabulary → expected change interval in
    * seconds; `never` maps to null (archived — no staleness accrues), an
    * absent/unknown value to the weekly default. A `when`-chain (not a
    * map lookup) so the DuckDB oracle replays it as a CASE verbatim.
    */
  private def changefreqIntervalSec(freq: Column): Column =
    when(freq === "always" || freq === "hourly", 3600L)
      .when(freq === "daily", 86400L)
      .when(freq === "weekly", 604800L)
      .when(freq === "monthly", 2592000L)
      .when(freq === "yearly", 31536000L)
      .when(freq === "never", lit(null).cast("long"))
      .otherwise(604800L)

  /** Staleness-driven recrawl priority from sitemap metadata — the half
    * of discovery that decides WHEN, not what ([[sitemapFrontierSeed]]
    * seeds the what): join the advertised
    * `(url, lastmod, changefreq, priority)` entries
    * ([[graft.functions.sitemap_entries]]) against the frontier's
    * last-fetch state and score each url:
    *
    *   - never crawled → staleness 4.0 (the seed tier — fetch first);
    *   - `lastmod` AFTER the last fetch → staleness 4.0 (the site says
    *     the copy is stale — the CDC signal without a fetch);
    *   - otherwise staleness = min(4, age / changefreq interval): a
    *     daily-changing page a week old outranks a yearly-changing page
    *     a month old; `never` pages accrue none;
    *   - score = coalesce(priority, 0.5) × staleness — the site's own
    *     importance weight, sitemaps.org's 0.5 default.
    *
    * Inputs: `entries(url, lastmod_sec, changefreq, priority)` (epoch
    * seconds — callers convert W3C datetimes with the engine's
    * `to_date`/`unix_timestamp`, pq104's shape) and
    * `crawlState(url, last_fetch_sec)`. Both sides collapse to one row
    * per CANONICAL url before the single co-partitioned left join
    * (duplicate advertisements keep the newest lastmod / highest
    * priority / most eager changefreq; duplicate state rows the newest
    * fetch) — fixed-width rows shuffle, content never. Composes with
    * [[frontierDiff]] (its `changed`/`added` rows are this scorer's
    * staleness-4 tier) and the politeness quotas
    * ([[politenessRoute]] caps how much of the ranked frontier each
    * domain may serve per window). Output:
    * `(canon_url, known_changed, staleness, score)`, `round(…, 6)` on
    * the doubles so parallel plans and the oracle agree bit-for-bit.
    */
  def recrawlPriority(
      entries: DataFrame,
      crawlState: DataFrame,
      nowSec: Long): DataFrame = {
    val e = entries
      .select(
        url_canonicalize(col("url")).as("canon_url"),
        col("lastmod_sec").cast("long").as("__lastmod"),
        changefreqIntervalSec(lower(col("changefreq"))).as("__interval"),
        col("priority").cast("double").as("__prio"))
      .groupBy(col("canon_url"))
      .agg(
        max(col("__lastmod")).as("__lastmod"),
        min(col("__interval")).as("__interval"),
        max(col("__prio")).as("__prio"))
    val s = crawlState
      .select(url_canonicalize(col("url")).as("canon_url"),
        col("last_fetch_sec").cast("long").as("__fetch"))
      .groupBy(col("canon_url"))
      .agg(max(col("__fetch")).as("__fetch"))
    val known = col("__lastmod").isNotNull && col("__fetch").isNotNull &&
      col("__lastmod") > col("__fetch")
    val staleness =
      when(col("__fetch").isNull, 4.0)
        .when(known, 4.0)
        .when(col("__interval").isNull, 0.0)
        .otherwise(least(lit(4.0),
          round((lit(nowSec) - col("__fetch")).cast("double") / col("__interval"), 6)))
    e.join(s, Seq("canon_url"), "left")
      .select(col("canon_url"),
        known.as("known_changed"),
        staleness.as("staleness"),
        round(coalesce(col("__prio"), lit(0.5)) * staleness, 6).as("score"))
  }

  /** Crawl-front funnel diagnostics (the pq44 shape for [[crawlToCorpus]]):
    * per-stage survivor counts — raw, URL-unique, post-blocklist, C4 page
    * survivors, Gopher survivors. Two tiers, each read ONCE:
    *
    *   1. URL tier: one narrow `(id, md5(canon), domain)` projection —
    *      the canonicalize chain (the family's dominant row-local cost)
    *      evaluates EXACTLY ONCE per row, where the previous self-join
    *      shape paid it once per join side (measured: the url tier alone
    *      cost more than the whole text tier). One partial-agg shuffle
    *      groups it by the 128-bit hash; the registrable domain is
    *      constant within a canonical group (it derives from the
    *      canonical URL), so the group row carries the ELECTION
    *      (min id), the copy count and the blocklist verdict together,
    *      and all three URL-tier counts fold from the group frame with
    *      no join back.
    *   2. text tier: the group frame (one row per canonical URL — keeper
    *      id, copy count, blocklist verdict) joins the raw `(id, text)`
    *      scan by id, losslessly for the group counters (every group's
    *      min id IS a row), and C4/Gopher score only pass2 keepers (null
    *      shortcut) — exactly the rows the pipeline itself would clean.
    *
    * ALL FIVE counters then fold in one aggregation over the joined
    * frame. Costs: the election shuffle (narrow, fixed-width), the id
    * join (group side broadcasts at bench scale; the same co-keyed join
    * as [[crawlToCorpus]]'s join-back otherwise — document text never
    * enters the URL tier either way), one global agg.
    *
    * PRECONDITION (same as [[crawlToCorpus]]): `idCol` is a UNIQUE,
    * NON-NULL document id. The keeper election stores one id per group
    * and joins it back to the raw frame; a duplicated id that wins an
    * election would join every duplicate row (inflating `n_raw` and all
    * downstream counters), and a group whose ids are all null has no
    * joinable keeper (dropping its copies from `n_raw`). Counting raw
    * rows independently would re-plan the canonicalize subtree (the
    * two-consumer pruning divergence this shape exists to avoid), so the
    * contract lives here: ids come from the document store, where they
    * are primary keys.
    */
  def crawlFunnel(
      df: DataFrame,
      idCol: Column,
      urlCol: Column,
      textCol: Column,
      blockedDomains: DataFrame,
      c4: graft.quality.C4Rules.Params = graft.quality.C4Rules.Params(),
      gopher: graft.quality.GopherRules.Params =
        graft.quality.GopherRules.Params()): DataFrame = {
    val narrow = df
      .select(idCol.as("__id"), url_canonicalize(urlCol).as("canon_url"))
      .select(col("__id"), md5(col("canon_url")).as("__uh"),
        url_domain(col("canon_url")).as("__domain"))
    val blocked = broadcast(
      blockedDomains.toDF("__bd").dropDuplicates("__bd"))
    // domain is a function of the canonical URL, hence constant per group:
    // min() is its deterministic representative (vs first()'s
    // order-dependence), and under the 128-bit hash a group holds one
    // canonical URL — the same identity assumption the election itself
    // makes
    // __real: a NULL canonical form (unparseable URL — e.g. a hostile IDN
    // host the drop-not-fail fold nulled) is not a URL group: it counts in
    // n_raw but in none of the post-raw counters — the same exclusion the
    // previous join shape applied (null keys never matched the keeper
    // join) and the one the pq88 oracle's md5-keyed join replays
    val groups = narrow.groupBy(col("__uh"))
      .agg(count(lit(1)).as("__n"), min(col("__id")).as("__keep_id"),
        min(col("__domain")).as("__dom"))
      .join(blocked, col("__dom") === col("__bd"), "left")
      .withColumn("__real", col("__uh").isNotNull)
      .withColumn("__ok", col("__real") && col("__bd").isNull)
      .select(col("__keep_id"), col("__n"), col("__real"), col("__ok"))
    // every group has exactly one keeper ROW in df (its min id), so joining
    // the group frame back by id is lossless for the group-level counters —
    // one joined row per canonical URL carries the copy count, the
    // blocklist verdict AND the keeper's text, and ALL FIVE funnel counters
    // fold in ONE aggregation. `groups` is consumed exactly once (two
    // consumers would re-plan the election subtree with divergent column
    // pruning — measured as a second full canonicalize pass).
    val keeperRows = df.select(idCol.as("__id"), textCol.as("__text"))
      .join(groups, col("__id") === col("__keep_id"), "inner")
      // null shortcut: text stages run only for pass2 keepers
      .withColumn("__ftext", when(col("__ok"), col("__text")))
    val g = graft.quality.GopherRules.withMetricsAndFlags(
      graft.quality.C4Rules.withClean(keeperRows, col("__ftext"), c4, "__c4"),
      col("__c4.clean_text"), gopher, "__gm", "__gf")
    g.agg(
      coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_raw"),
      count(when(col("__real"), 1)).as("n_url_unique"),
      count(when(col("__ok"), 1)).as("n_unblocked"),
      count(when(col("__ok") && col("__c4.page_keep"), 1)).as("n_c4_kept"),
      count(when(col("__ok") && col("__c4.page_keep") &&
        col("__gf.gopher_keep"), 1)).as("n_gopher_kept"))
  }

  /** The STREAMING crawl front — [[crawlToCorpus]] stages 1-4 on a live
    * frontier: canonical-URL dedup (watermark-bounded, first canonical
    * form wins), registrable-domain blocklist (stream-static broadcast
    * anti-join), C4 line cleaning + page gate and the Gopher rule gate
    * (both row-local, hence trivially stream-safe). ONE stateful operator
    * (the dedup) — Spark cannot chain `mapGroupsWithState` behind another
    * stateful operator, so the per-domain cap is the documented second
    * hop: pipe this stream (directly or via a sink/foreachBatch handoff)
    * into [[graft.streaming.StreamingCaps.perSourceCapStream]] keyed by
    * `domain`, whose last emission per domain equals the batch cap
    * (StreamingSpec). Output per admitted doc: (doc_id, canon_url,
    * domain, score, clean_hash) — [[crawlToCorpus]]'s pre-cap admitted
    * table; UrlCurationSpec proves stream ≡ batch end to end including
    * the cap hop.
    */
  def crawlGateStream(
      df: DataFrame,
      idCol: Column,
      urlCol: Column,
      textCol: Column,
      tsCol: String,
      watermarkDelay: String,
      blockedDomains: DataFrame,
      c4: graft.quality.C4Rules.Params = graft.quality.C4Rules.Params(),
      gopher: graft.quality.GopherRules.Params =
        graft.quality.GopherRules.Params(),
      psl: Option[Psl] = None): DataFrame = {
    val canon = df.select(
      col(tsCol), idCol.as("doc_id"), textCol.as("__text"),
      url_canonicalize(urlCol).as("canon_url"))
      .withColumn("__canon_key", md5(col("canon_url")))
    val deduped = graft.streaming.StreamOps.dedupeStream(
      canon, Seq("__canon_key"), tsCol, watermarkDelay)
    // the PSL form stays stream-safe: every probe is a stream-static
    // broadcast join, like the blocklist itself. Domain computed ONCE and
    // carried through the row-local stages.
    val blocked = broadcast(
      blockedDomains.toDF("__bd").dropDuplicates("__bd"))
    val unblocked = withDomain(deduped, col("canon_url"), psl, "domain")
      .join(blocked, col("domain") === col("__bd"), "left_anti")
    val cleaned = graft.quality.C4Rules
      .withClean(unblocked, col("__text"), c4, "__c4")
      .filter(col("__c4.page_keep"))
      .withColumn("__clean", col("__c4.clean_text"))
    graft.quality.GopherRules
      .withMetricsAndFlags(cleaned, col("__clean"), gopher, "__gm", "__gf")
      .filter(col("__gf.gopher_keep"))
      .select(col("doc_id"), col("canon_url"), col("domain"),
        graft.functions.TextFunctions.quality_score(
          regexp_replace(col("__clean"), "\n", " ")).as("score"),
        md5(col("__clean")).as("clean_hash"))
  }

  /** [[crawlGateStream]] with SLOW-CADENCE REFRESH of every broadcast
    * table — the posture a weeks-long frontier stream needs: the PSL
    * grows, robots files get re-fetched, the blocklist is operated live,
    * and none of them may require a query restart (the stateful URL-dedup
    * upstream would lose nothing — but a restart is an operational event;
    * the reference reloads this class of config through its property
    * registry at runtime, P1-P4). The ONE stateful operator (watermark-
    * bounded canonical-URL dedup) stays in the streaming plan and keeps
    * its checkpoint; everything downstream of it is stateless and moves
    * into `foreachBatch`, where the tables re-resolve from their
    * providers every `refreshEveryBatches` micro-batches
    * ([[graft.streaming.RefreshedRef]] — the dq25 trigger-boundary
    * re-broadcast pattern) and enter that batch's plan as fresh broadcast
    * relations. Optionally gates on robots rules first
    * ([[robotsGate]] — excluded rows drop) when `robotsProvider` is
    * given. `sink` receives each micro-batch's admitted docs in
    * [[crawlGateStream]]'s output schema
    * (doc_id, canon_url, domain, score, clean_hash).
    */
  def crawlGateStreamRefreshed(
      df: DataFrame,
      idCol: Column,
      urlCol: Column,
      textCol: Column,
      tsCol: String,
      watermarkDelay: String,
      blockedProvider: () => Seq[String],
      refreshEveryBatches: Int,
      checkpointDir: String,
      queryName: String,
      pslProvider: Option[() => Psl] = None,
      robotsProvider: Option[(String, () => Seq[(String, String)])] = None,
      c4: graft.quality.C4Rules.Params = graft.quality.C4Rules.Params(),
      gopher: graft.quality.GopherRules.Params =
        graft.quality.GopherRules.Params())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.streaming.RefreshedRef
    val canon = df.select(
      col(tsCol), idCol.as("doc_id"), textCol.as("__text"), urlCol.as("__url"),
      url_canonicalize(urlCol).as("canon_url"))
      .withColumn("__canon_key", md5(col("canon_url")))
    val deduped = graft.streaming.StreamOps.dedupeStream(
      canon, Seq("__canon_key"), tsCol, watermarkDelay)
    val blockedRef = new RefreshedRef(blockedProvider, refreshEveryBatches)
    val pslRef = pslProvider.map(p => new RefreshedRef(p, refreshEveryBatches))
    val robotsRef = robotsProvider.map { case (agent, p) =>
      (agent, new RefreshedRef(p, refreshEveryBatches))
    }
    deduped.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val robotsGated = robotsRef match {
          case Some((agent, ref)) =>
            val robots = ref.at(batchId).toDF("host", "robots_txt")
            // gate on the RAW url: robots paths are matched pre-
            // canonicalization (tracking params are still fetch-relevant
            // to a Disallow: /*?utm rule)
            robotsGate(batch, col("__url"), robots, agent)._1
          case None => batch
        }
        val blocked = broadcast(
          blockedRef.at(batchId).toDF("__bd").dropDuplicates("__bd"))
        val unblocked = withDomain(
          robotsGated, col("canon_url"), pslRef.map(_.at(batchId)), "domain")
          .join(blocked, col("domain") === col("__bd"), "left_anti")
        val cleaned = graft.quality.C4Rules
          .withClean(unblocked, col("__text"), c4, "__c4")
          .filter(col("__c4.page_keep"))
          .withColumn("__clean", col("__c4.clean_text"))
        val out = graft.quality.GopherRules
          .withMetricsAndFlags(cleaned, col("__clean"), gopher, "__gm", "__gf")
          .filter(col("__gf.gopher_keep"))
          .select(col("doc_id"), col("canon_url"), col("domain"),
            graft.functions.TextFunctions.quality_score(
              regexp_replace(col("__clean"), "\n", " ")).as("score"),
            md5(col("__clean")).as("clean_hash"))
        sink(out)
      }
      .start()
  }

  /** Robots-exclusion gate (RFC 9309): split a URL frontier into
    * (allowed, excluded) under each host's robots.txt rules for `agent`.
    * `robotsDf` is (host, robots_txt) — one row per authority, the file a
    * polite crawler fetched once per host. 100 TB shape: the robots side
    * is SMALL (thousands of authorities); its texts are parsed to rule
    * arrays THERE ([[graft.functions.robots_rules]] — once per authority,
    * not per URL), the narrow (host, rules) table rides a BROADCAST left
    * join keyed by the frontier's host, and the longest-match verdict
    * ([[graft.functions.robots_allowed]]) is row-local — the frontier
    * never shuffles. A URL whose host has no robots row is allowed (the
    * RFC's unavailable-file rule: 404 ⇒ crawl permitted). Stream-safe:
    * the join is stream-static, the verdict row-local.
    */
  def robotsGate(
      df: DataFrame,
      urlCol: Column,
      robotsDf: DataFrame,
      agent: String): (DataFrame, DataFrame) = {
    val tempNames = Seq("__rb_h", "__rb_p", "__rb_host", "__rb_rules", "__rb_ok")
    graft.operators.Compaction.requireFreshNames(
      df, tempNames.map(_ => urlCol), tempNames)
    // lowercase BEFORE dedup: case-variant rows for one authority must
    // collapse to ONE broadcast key, or a frontier row would join (and be
    // emitted) once per variant
    val rules = broadcast(
      robotsDf.toDF("__rb_host0", "__rb_txt")
        .select(lower(col("__rb_host0")).as("__rb_host"), col("__rb_txt"))
        .dropDuplicates("__rb_host")
        .select(col("__rb_host"),
          graft.functions.robots_rules(col("__rb_txt"), agent).as("__rb_rules")))
    // the match target is path + query (RFC 9309 matches against the
    // URI's path WITH its query — real robots files carry '?session='
    // style Disallow rules); only the fragment is outside the match
    val pathQuery = regexp_replace(
      regexp_replace(urlCol,
        graft.functions.UrlFunctions.AuthorityPrefixRe, ""), "#.*$", "")
    val gated = df
      .withColumn("__rb_h", url_host(urlCol))
      .withColumn("__rb_p", when(pathQuery === "", "/").otherwise(pathQuery))
      .join(rules, col("__rb_h") === col("__rb_host"), "left")
      .withColumn("__rb_ok",
        col("__rb_rules").isNull ||
          graft.functions.robots_allowed(col("__rb_p"), col("__rb_rules")))
    (gated.filter(col("__rb_ok")).drop(tempNames: _*),
      gated.filter(!col("__rb_ok")).drop(tempNames: _*))
  }

  /** Crawl politeness: per tumbling event-time window, divert the URLs of
    * any registrable domain whose fetch volume reaches `maxPerWindow` onto
    * the shaped side — exactly the decaton per-key quota machinery
    * (A3/A4: [[graft.streaming.StreamOps.routeByQuotaSketch]], the
    * reference's live CMS-estimate decision rule) keyed by
    * [[UrlFunctions.url_domain]]. A crawl frontier is the textbook
    * shaping workload: one hot site must not starve the fetch pool, and
    * domain cardinality is unbounded — the sketch's fixed-width state is
    * the 100 TB posture (`sketch = false` switches to the exact per-domain
    * count for bounded frontiers). Returns (polite, diverted); run per
    * micro-batch inside foreachBatch, like the shaping loop
    * (ShapingLoopSpec) drives routeByQuotaSketch.
    */
  def politenessRoute(
      batch: DataFrame,
      urlCol: Column,
      tsCol: Column,
      windowDur: String,
      maxPerWindow: Long,
      sketch: Boolean = true): (DataFrame, DataFrame) =
    if (sketch)
      graft.streaming.StreamOps.routeByQuotaSketch(
        batch, url_domain(urlCol), tsCol, windowDur, maxPerWindow)
    else
      graft.streaming.StreamOps.routeByQuota(
        batch, url_domain(urlCol), tsCol, windowDur, maxPerWindow)

  /** [[politenessRoute]] keyed by the FULL-PSL registrable domain instead
    * of the pinned-subset column heuristic: under a wildcard registry
    * (`*.kawasaki.jp`) the heuristic pools every sub-registry under one
    * key — one hot municipal site absorbs the whole TLD's politeness
    * budget — while the PSL form splits them into their real registrable
    * domains. The domain enrichment is the broadcast-join chain of
    * [[Psl.withRegistrableDomain]] (zero corpus shuffle), the routing the
    * same quota machinery as [[politenessRoute]]. Long-running loops:
    * this runs per micro-batch inside foreachBatch, so a LIVE rule table
    * is one [[graft.streaming.RefreshedRef]] away — re-resolve `psl`
    * every N batches and the next trigger routes under the grown list,
    * no restart (CrawlRefreshSpec proves the pattern end to end).
    */
  def politenessRoutePsl(
      batch: DataFrame,
      urlCol: Column,
      tsCol: Column,
      windowDur: String,
      maxPerWindow: Long,
      psl: Psl,
      sketch: Boolean = true): (DataFrame, DataFrame) = {
    val keyed = psl.withRegistrableDomain(
      batch, url_host(urlCol), outCol = "__pr_dom")
    val (ok, shaped) =
      if (sketch)
        graft.streaming.StreamOps.routeByQuotaSketch(
          keyed, col("__pr_dom"), tsCol, windowDur, maxPerWindow)
      else
        graft.streaming.StreamOps.routeByQuota(
          keyed, col("__pr_dom"), tsCol, windowDur, maxPerWindow)
    (ok.drop("__pr_dom"), shaped.drop("__pr_dom"))
  }

  /** Robots-driven per-domain politeness quotas: parse each authority's
    * robots.txt `Crawl-delay` for `agent`
    * ([[graft.functions.robots_crawl_delay]]) and turn it into a
    * per-REGISTRABLE-DOMAIN fetch quota for one `windowDur` window:
    * `quota = max(1, floor(windowSeconds / delay))` — a delay of d seconds
    * admits one fetch per d seconds, floored at 1 so a delay longer than
    * the window still makes progress (shaped, not starved). Multiple
    * hosts mapping to one registrable domain collapse to the MINIMUM
    * quota (most restrictive host governs — the polite reading). Hosts
    * without a delay are absent from the table (the router's
    * `defaultQuota` applies). Output: (domain, quota). 100 TB shape: the
    * robots side is authority-scale; parse + PSL enrichment happen THERE,
    * and the table broadcasts into the router — the frontier never
    * shuffles for it.
    */
  def robotsQuotaTable(
      robotsDf: DataFrame,
      agent: String,
      windowDur: String,
      psl: Option[Psl] = None): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(windowDur))
    require(iv.months == 0,
      s"robotsQuotaTable needs a fixed-length window, got '$windowDur' (months vary)")
    val windowSec = iv.days * 86400.0 + iv.microseconds / 1e6
    require(windowSec > 0, s"windowDur must be positive, got '$windowDur'")
    val hosts = robotsDf.toDF("__rq_host0", "__rq_txt")
      .select(lower(col("__rq_host0")).as("__rq_host"), col("__rq_txt"))
      .dropDuplicates("__rq_host")
      .select(col("__rq_host"),
        graft.functions.robots_crawl_delay(col("__rq_txt"), agent).as("__rq_delay"))
      .filter(col("__rq_delay").isNotNull)
    val keyed = psl match {
      case Some(p) => p.withRegistrableDomain(hosts, col("__rq_host"), "domain")
      case None => hosts.withColumn("domain",
        graft.functions.UrlFunctions.url_registrable_domain(col("__rq_host")))
    }
    keyed
      .select(col("domain"),
        greatest(lit(1L),
          floor(lit(windowSec) / col("__rq_delay")).cast("long")).as("quota"))
      .groupBy(col("domain")).agg(min(col("quota")).as("quota"))
  }

  /** [[politenessRoute]] with the per-domain rate driven by each
    * authority's robots.txt `Crawl-delay` instead of one global
    * `maxPerWindow` — the loop a production crawler actually runs: fetch
    * robots once per authority, derive the domain's window quota
    * ([[robotsQuotaTable]]), and divert any domain exceeding ITS OWN rate
    * onto the shaped side while domains without a declared delay take
    * `defaultQuota`. Keyed by the full-PSL registrable domain when `psl`
    * is given, the column heuristic otherwise; decision via the exact
    * per-(window, domain) count or the CMS estimate (`sketch = true`, the
    * reference's live rule — fixed-width state at unbounded domain
    * cardinality). Returns (polite, diverted); run per micro-batch inside
    * foreachBatch like the shaping loop (ShapingLoopSpec's robots case).
    */
  def politenessRouteRobots(
      batch: DataFrame,
      urlCol: Column,
      tsCol: Column,
      windowDur: String,
      robotsDf: DataFrame,
      agent: String,
      defaultQuota: Long,
      psl: Option[Psl] = None,
      sketch: Boolean = true): (DataFrame, DataFrame) = {
    val quotas = robotsQuotaTable(robotsDf, agent, windowDur, psl)
    val keyed = psl match {
      case Some(p) => p.withRegistrableDomain(batch, url_host(urlCol), "__pr_dom")
      case None => batch.withColumn("__pr_dom", url_domain(urlCol))
    }
    val (ok, shaped) =
      if (sketch)
        graft.streaming.StreamOps.routeByQuotaSketchTable(
          keyed, col("__pr_dom"), tsCol, windowDur, quotas, defaultQuota)
      else
        graft.streaming.StreamOps.routeByQuotaTable(
          keyed, col("__pr_dom"), tsCol, windowDur, quotas, defaultQuota)
    (ok.drop("__pr_dom"), shaped.drop("__pr_dom"))
  }

  /** FLAGSHIP: raw crawl → clean corpus in ONE plan — the full crawl front
    * composed from the already-audited stages:
    *   1. canonical-URL dedup ([[canonicalUrlDedup]] shape — pq83);
    *   2. registrable-domain blocklist ([[domainBlocklist]] — broadcast
    *      anti-join);
    *   3. C4 line cleaning + page gate ([[graft.quality.C4Rules]] — pq85;
    *      REWRITES the text, drops code/lorem pages);
    *   4. Gopher rule gate on the CLEANED text
    *      ([[graft.quality.GopherRules]] — pq84);
    *   5. per-domain cap by quality score of the cleaned text
    *      ([[Curation.perSourceCap]]'s bounded heap — pq55).
    * Stages 3-4 are row-local, so the whole pipeline costs the dedup
    * election shuffle, the co-keyed keeper join, one cap-heap exchange and
    * the final id-keyed join back — document text shuffles ZERO times.
    * Output per admitted doc: (doc_id, domain, rank, score, n_total,
    * canon_url, clean_hash); `n_total` counts the domain's fully-gated
    * survivors, so cap cuts are auditable. Oracle-checked end to end by
    * pq86 (all five stage oracles chained as CTEs).
    *
    * PRECONDITION: `idCol` is a unique, non-null document id (the
    * document store's primary key) — the keeper join-back selects rows
    * by elected id, so duplicate ids would multiply keeper rows and a
    * null id can never win its group (see [[crawlFunnel]]).
    */
  def crawlToCorpus(
      df: DataFrame,
      idCol: Column,
      urlCol: Column,
      textCol: Column,
      blockedDomains: DataFrame,
      cap: Int,
      c4: graft.quality.C4Rules.Params = graft.quality.C4Rules.Params(),
      gopher: graft.quality.GopherRules.Params =
        graft.quality.GopherRules.Params(),
      psl: Option[Psl] = None): DataFrame = {
    graft.functions.requireIntegralId(df, idCol, "crawlToCorpus")
    val withHash = df.select(
      idCol.as("__id"), textCol.as("__text"),
      url_canonicalize(urlCol).as("canon_url"))
      .withColumn("__uh", md5(col("canon_url")))
    // keeper key renamed — see curateCrawl
    val keepers = withHash
      .groupBy(col("__uh")).agg(min(col("__id")).as("__keep_id"))
      .select(col("__uh").as("__kuh"), col("__keep_id"))
    val deduped = withHash.join(
      keepers,
      col("__uh") === col("__kuh") && col("__id") === col("__keep_id"),
      "inner")
      .select(col("__id"), col("__text"), col("canon_url"))
    // registrable domain computed ONCE, right after the URL tier; the
    // blocklist anti-joins against it and the cap key rides along through
    // the row-local C4/Gopher stages
    val blocked = broadcast(
      blockedDomains.toDF("__bd").dropDuplicates("__bd"))
    val unblocked = withDomain(deduped, col("canon_url"), psl, "domain")
      .join(blocked, col("domain") === col("__bd"), "left_anti")
    val cleaned = graft.quality.C4Rules
      .withClean(unblocked, col("__text"), c4, "__c4")
      .filter(col("__c4.page_keep"))
      .withColumn("__clean", col("__c4.clean_text"))
    val gated = graft.quality.GopherRules
      .withMetricsAndFlags(cleaned, col("__clean"), gopher, "__gm", "__gf")
      .filter(col("__gf.gopher_keep"))
      .drop("__gm", "__gf")
    // stage boundary (narrow: id, urls, score, text hash — see curateCrawl)
    val admitted = Curation.persistStage(
      gated.select(col("__id"), col("canon_url"), col("domain"),
        graft.functions.TextFunctions.quality_score(
          regexp_replace(col("__clean"), "\n", " ")).as("__score"),
        md5(col("__clean")).as("clean_hash")))
    Curation.perSourceCap(
      admitted, col("__id"), col("domain"), col("__score"), cap)
      .withColumnRenamed("source", "domain")
      .join(
        admitted.select(col("__id").as("doc_id"), col("canon_url"),
          col("clean_hash")),
        Seq("doc_id"))
  }

  /** WARC → WET conversion (the Common Crawl text-extraction sidecar:
    * every `response` record becomes a `conversion` record whose block is
    * the EXTRACTED PLAIN TEXT — ISO 28500 §6.8 + the WET convention).
    * Composes the round-19 decode chain end to end, all row-local:
    * `http_text` (de-chunk → inflate → charset-detect → decode) then
    * `extract_text` (script/style drop, tag strip, entity decode,
    * whitespace collapse). Undecodable responses (http_text null —
    * drop-not-fail) produce no conversion record, like the real WET
    * generator. Output columns feed the `graft-warc` sink directly:
    * (target_uri, content, warc_type='conversion', warc_date passthrough,
    * record_id derived from the source id — deterministic, so a replayed
    * epoch re-serializes byte-identically under the sink's
    * effectively-once rename).
    */
  def toWetRecords(warc: DataFrame): DataFrame = {
    import graft.functions.{http_text, TextFunctions}
    warc
      .filter(col("warc_type") === "response")
      .withColumn("__text", http_text(col("content")))
      .filter(col("__text").isNotNull)
      .withColumn("__extracted", TextFunctions.extract_text(col("__text")))
      .select(
        col("target_uri"),
        col("__extracted").as("content"),
        lit("conversion").as("warc_type"),
        col("warc_date"),
        // real WET records annotate the identified content language
        // (ISO 28500 §5 WARC-Identified-Content-Language); the stopword-
        // vote langid (pq11's operator) runs over the EXTRACTED text —
        // markup must not vote
        TextFunctions.lang_guess(col("__extracted")).as("content_language"),
        // derived id: stable function of the source record's id (brackets
        // stripped if present, so a NON-bracketed source id still derives
        // a DISTINCT wet id — reusing the source id verbatim would break
        // record-id uniqueness across the archive), or the coordinate
        // when the source id is absent
        coalesce(
          concat(lit("<urn:wet:"),
            regexp_replace(col("record_id"), "^<|>$", ""), lit(">")),
          concat(lit("<urn:wet:"), col("file"), lit(":"), col("pos"),
            lit(":"), col("sub"), lit(">"))).as("record_id"))
  }

  /** WARC `revisit` resolution — the edge table (ISO 28500 §6.7.2 / WARC
    * 1.1 §6.7): a crawler that already holds a URL's payload emits a
    * `revisit` record carrying `WARC-Refers-To` (the original's record id)
    * and/or `WARC-Refers-To-Target-URI` + `WARC-Payload-Digest` instead of
    * repeating the bytes — Common Crawl's crawl-time dedup. A front that
    * ignores them undercounts duplicates and drops retrievable documents.
    *
    * Input: a `graft-warc` frame. Output: one row per revisit —
    * `(revisit_record_id, revisit_uri, revisit_date, original_record_id,
    * original_uri, original_file, original_pos, original_sub,
    * original_length, resolved_by)` — `resolved_by` ∈ ('refers-to',
    * 'uri-digest', null for unresolved). Resolution order:
    *   1. `WARC-Refers-To` = the original's `WARC-Record-ID` (exact);
    *   2. else (`WARC-Refers-To-Target-URI` | the revisit's own target
    *      URI) + `WARC-Payload-Digest` against the original's URI and
    *      digest header — digest equality makes any matching original
    *      byte-identical, so the minimum record id is a canonical
    *      representative, not an arbitrary pick.
    *
    * 100 TB shape: ONLY fixed-width columns shuffle (ids, uris, digests,
    * coordinates) — payload bytes never enter either join. The output is
    * simultaneously the dedup-cluster edge set (feed (revisit, original)
    * pairs into the pq23/pq97 cluster machinery) and the random-access
    * coordinate set ([[graft.sources.warc.WarcIndex.fetchMany]] point-
    * reads the original payloads for exactly the revisits a query needs).
    */
  def revisitEdges(warc: DataFrame): DataFrame = {
    val originals = warc
      .filter(col("warc_type").isin("response", "resource"))
      .select(
        col("record_id").as("__o_id"),
        col("target_uri").as("__o_uri"),
        element_at(col("headers"), "warc-payload-digest").as("__o_digest"),
        col("file").as("original_file"),
        col("pos").as("original_pos"),
        col("sub").as("original_sub"),
        col("content_length").as("original_length"))
    val revisits = warc
      .filter(col("warc_type") === "revisit")
      .select(
        col("record_id").as("revisit_record_id"),
        col("target_uri").as("revisit_uri"),
        col("warc_date").as("revisit_date"),
        element_at(col("headers"), "warc-refers-to").as("__refers_id"),
        coalesce(
          element_at(col("headers"), "warc-refers-to-target-uri"),
          col("target_uri")).as("__refers_uri"),
        element_at(col("headers"), "warc-payload-digest").as("__digest"))
    // arm 1: exact record-id reference
    val byId = revisits.join(originals, col("__refers_id") === col("__o_id"), "left")
    val resolvedById = byId.filter(col("__o_id").isNotNull)
      .withColumn("resolved_by", lit("refers-to"))
    // arm 2: (uri, digest) for the rest — digest-equal originals are
    // byte-identical, elect min id as the canonical one
    val unresolved = byId.filter(col("__o_id").isNull).select(revisits.columns.map(col): _*)
    val canonicalByUriDigest = originals
      .filter(col("__o_digest").isNotNull)
      .groupBy(col("__o_uri"), col("__o_digest"))
      .agg(min(struct(col("__o_id"), col("original_file"), col("original_pos"),
        col("original_sub"), col("original_length"))).as("__c"))
      .select(col("__o_uri").as("__cu"), col("__o_digest").as("__cd"),
        col("__c.__o_id").as("__o_id"), col("__c.original_file").as("original_file"),
        col("__c.original_pos").as("original_pos"), col("__c.original_sub").as("original_sub"),
        col("__c.original_length").as("original_length"))
    val byDigest = unresolved.join(
      canonicalByUriDigest,
      col("__refers_uri") === col("__cu") && col("__digest") === col("__cd"),
      "left")
      .withColumn("resolved_by",
        when(col("__o_id").isNotNull, lit("uri-digest")))
    val outCols = Seq(
      col("revisit_record_id"), col("revisit_uri"), col("revisit_date"),
      col("__o_id").as("original_record_id"),
      col("original_file"), col("original_pos"), col("original_sub"),
      col("original_length"), col("resolved_by"))
    resolvedById.select(outCols: _*).unionByName(byDigest.select(outCols: _*))
  }

  /** The resolved-corpus convenience form of [[revisitEdges]]: every
    * non-revisit record passes through; every resolved revisit carries the
    * ORIGINAL's content (and `resolved_from` = the original record id).
    * This joins payload bytes across the cluster — at archive scale prefer
    * [[revisitEdges]] + [[graft.sources.warc.WarcIndex.fetchMany]], which
    * point-reads instead of shuffling content; this form is the right
    * answer when the frame is already a filtered slice.
    */
  def resolveRevisits(warc: DataFrame): DataFrame = {
    val edges = revisitEdges(warc)
      .select(col("revisit_record_id").as("__rid"),
        col("original_record_id").as("__oid"))
    val originalContent = warc
      .filter(col("warc_type").isin("response", "resource"))
      .select(col("record_id").as("__cid"), col("content").as("__ocontent"))
    val passThrough = warc.filter(col("warc_type") =!= "revisit" || col("warc_type").isNull)
      .withColumn("resolved_from", lit(null).cast("string"))
      .withColumn("resolved_content", col("content"))
    val revisits = warc.filter(col("warc_type") === "revisit")
      .join(edges, col("record_id") === col("__rid"), "left")
      .join(originalContent, col("__oid") === col("__cid"), "left")
      .withColumn("resolved_from", col("__oid"))
      .withColumn("resolved_content", col("__ocontent"))
      .drop("__rid", "__oid", "__cid", "__ocontent")
    passThrough.unionByName(revisits)
  }
}
