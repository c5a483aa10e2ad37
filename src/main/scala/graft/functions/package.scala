package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.GraftBridge

/** Column-level function surface of the engine. Everything here is a thin
  * Catalyst wrapper — usable from the DataFrame API without session-level
  * registration.
  */
package object functions {

  private[graft] def toColumn(e: Expression): Column = GraftBridge.column(e)
  private[graft] def toExpr(c: Column): Expression = GraftBridge.expression(c)

  /** Loud precondition for operators that key a bounded heap on long ids
    * ([[top_k_by]] casts ids to long and SKIPS null casts): a string/UUID id
    * column would make every row invisible and the output silently empty.
    */
  private[graft] def requireIntegralId(
      df: org.apache.spark.sql.DataFrame, idCol: Column, op: String): Unit = {
    val dt = df.select(idCol).schema.head.dataType.simpleString
    require(Seq("byte", "short", "int", "integer", "long", "bigint").contains(dt),
      s"$op: id column has non-integral type $dt — top_k_by keys on longs; " +
        "map string ids to longs first")
  }

  /** Decode `dt_meta` header bytes → metadata struct (null on malformed). */
  def dt_meta_decode(c: Column): Column = toColumn(DtMetaDecode(toExpr(c)))

  /** Encode a metadata struct (field order of TaskMetadata.schema) → bytes. */
  def dt_meta_encode(c: Column): Column = toColumn(DtMetaEncode(toExpr(c)))

  /** Aggregate: Count-Min sketch (conservative update by default) over
    * binary keys. `conservative = false` switches to plain (sum) updates —
    * order/partition-independent, externally reproducible; `portable = true`
    * swaps murmur3 double hashing for the md5-prefix portable family so an
    * SQL oracle can recompute every cell.
    */
  def cms_sketch(key: Column, width: Int = graft.plans.CmsSketch.DefaultWidth,
                 depth: Int = graft.plans.CmsSketch.DefaultDepth,
                 conservative: Boolean = true, portable: Boolean = false): Column =
    toColumn(graft.plans.CmsSketchAgg(toExpr(key), width, depth, conservative, portable)
      .toAggregateExpression())

  /** Scalar: estimated (upper-bound) count of `key` in a serialized sketch.
    * `portable` must match the family the sketch was built with.
    */
  def cms_estimate(sketch: Column, key: Column, portable: Boolean = false): Column =
    toColumn(graft.plans.CmsEstimate(toExpr(sketch), toExpr(key), portable))

  /** Scalar: a serialized sketch's width·depth cells as `array<long>` (row r
    * at `[r·width, (r+1)·width)`) — the relational window for cell-join
    * estimates (see [[graft.plans.CmsCells]]).
    */
  def cms_cells(sketch: Column): Column =
    toColumn(graft.plans.CmsCells(toExpr(sketch)))

  /** Aggregate: SpaceSaving heavy-hitters summary over a string column →
    * array<struct<term, est, err>> (est desc, term asc). Exact while the
    * distinct-key count stays within `capacity`; ε = N/capacity otherwise.
    */
  def space_saving(term: Column, capacity: Int): Column =
    toColumn(graft.plans.SpaceSavingAgg(toExpr(term), capacity).toAggregateExpression())

  /** Aggregate: fixed-width bucket histogram → array<long> of n counts
    * (one mergeable summary per group — the streaming-drift building
    * block; see [[graft.plans.BucketHistAgg]]).
    */
  def bucket_hist(bucket: Column, n: Int): Column =
    toColumn(graft.plans.BucketHistAgg(
      toExpr(bucket.cast("long")), n).toAggregateExpression())

  /** Native 60-bit media frame fingerprint (one md5 per region, Horner fold
    * — see [[graft.plans.MediaFrameFingerprint]]).
    */
  def media_frame_fp(frame: Column): Column =
    toColumn(graft.plans.MediaFrameFingerprint(toExpr(frame)))

  /** zlib compression ratio in per-mille — the Gopher-style repetition/
    * boilerplate signal (see [[graft.plans.CompressionRatioPm]]).
    */
  def compression_ratio_pm(text: Column): Column =
    toColumn(graft.plans.CompressionRatioPm(toExpr(text)))

  /** Native PQ encode: m nearest-centroid codes per vector (tight primitive
    * loop, left-fold float contract — see [[graft.plans.PqEncodeExpr]]).
    */
  def pq_encode(vec: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    toColumn(graft.plans.PqEncodeExpr(toExpr(vec), cb))

  /** Native dense mat-vec `y = M·x` — the row-local OPQ rotation
    * (see [[graft.plans.MatVecExpr]]); the matrix rides the plan once.
    */
  def mat_vec(vec: Column, mat: Seq[Seq[Double]]): Column =
    toColumn(graft.plans.MatVecExpr(toExpr(vec), mat))

  /** Row-local token removal + reassembly: drop the tokens at the given
    * SORTED positions → `struct(n_tokens, n_removed, text_clean)`
    * (see [[graft.plans.RemoveTokenPositions]]).
    */
  def remove_token_positions(tokens: Column, positions: Column): Column =
    toColumn(graft.plans.RemoveTokenPositions(toExpr(tokens), toExpr(positions)))

  /** BPE subword tokenization (the true greedy merge loop) → one
    * array<string> of subwords per whitespace word. The merge table is
    * driver-resident vocabulary baked into the expression.
    */
  def bpe_subwords(text: Column, merges: Seq[(String, String)]): Column =
    toColumn(graft.plans.BpeSubwords(toExpr(text), merges))

  /** IDN fold: hostname → lowercased ASCII/punycode form (`münchen.example`
    * → `xn--mnchen-3ya.example`); unfoldable input passes through unchanged
    * (see [[graft.plans.IdnAscii]]).
    */
  def idn_ascii(host: Column): Column =
    toColumn(graft.plans.IdnAscii(toExpr(host)))

  /** Mojibake repair: UTF-8-decoded-as-Windows-1252 text ("cafÃ©",
    * "donâ€™t") restored via the strict encode/decode round-trip;
    * conservative — anything that does not round-trip cleanly passes
    * through unchanged (see [[graft.plans.FixMojibake]]).
    */
  def fix_mojibake(text: Column): Column =
    toColumn(graft.plans.FixMojibake(toExpr(text)))

  /** robots.txt text → the RFC 9309 rule group governing `agent`
    * (`array<struct<allow, pattern>>` — see [[graft.plans.RobotsRules]]).
    */
  def robots_rules(text: Column, agent: String): Column =
    toColumn(graft.plans.RobotsRules(toExpr(text), agent))

  /** RFC 9309 longest-match verdict for a path against a parsed rule
    * group ([[robots_rules]]): `*` wildcards, `$` end anchor, longest
    * pattern prevails, ties to allow, no match ⇒ allowed.
    */
  def robots_allowed(path: Column, rules: Column): Column =
    toColumn(graft.plans.RobotsDecision(toExpr(path), toExpr(rules)))

  /** robots.txt text → the `Crawl-delay` (seconds) governing `agent`, null
    * when none — the de-facto per-domain fetch-rate extension
    * ([[graft.plans.RobotsCrawlDelay]]); feeds
    * [[graft.pipeline.WebCuration.politenessRouteRobots]]'s quota table.
    */
  def robots_crawl_delay(text: Column, agent: String): Column =
    toColumn(graft.plans.RobotsCrawlDelay(toExpr(text), agent))

  /** robots.txt text → all `Sitemap:` URLs (standalone records, file
    * order — [[graft.plans.RobotsSitemaps]]).
    */
  def robots_sitemaps(text: Column): Column =
    toColumn(graft.plans.RobotsSitemaps(toExpr(text)))

  /** sitemap document → its PAGE urls — `<urlset>` `<loc>` entries
    * (entity-unescaped) or plain-text lines ([[graft.plans.SitemapUrls]]).
    */
  def sitemap_urls(doc: Column): Column =
    toColumn(graft.plans.SitemapUrls(toExpr(doc)))

  /** sitemap document → its CHILD sitemap urls (`<sitemapindex>` entries —
    * the discovery recursion edge; [[graft.plans.SitemapChildren]]).
    */
  /** Sitemap entries WITH recrawl metadata —
    * `array<struct<loc, lastmod, changefreq, priority>>`
    * ([[graft.plans.SitemapEntries]]); the lastmod/changefreq/priority
    * half of discovery that decides WHEN to revisit, feeding
    * [[graft.pipeline.WebCuration.recrawlPriority]].
    */
  def sitemap_entries(doc: Column): Column =
    toColumn(graft.plans.SitemapEntries(toExpr(doc)))

  /** `<a href>` links of a page — `array<struct<href, anchor, rel>>`
    * ([[graft.plans.ExtractLinks]]): raw href as written, visible anchor
    * text, `rel` attribute (`nofollow` is a per-link crawl directive).
    */
  def extract_links(html: Column): Column =
    toColumn(graft.plans.ExtractLinks(toExpr(html)))

  /** Page-level robots-meta directives — `struct(noindex, nofollow)`
    * ([[graft.plans.RobotsMetaDirectives]]); the in-page counterpart of
    * robots.txt, feeding the corpus gate (noindex) and
    * [[graft.pipeline.WebCuration.linkGraph]] (nofollow).
    */
  def robots_meta(html: Column): Column =
    toColumn(graft.plans.RobotsMetaDirectives(toExpr(html)))

  /** RFC 3986 §5 reference resolution ([[graft.plans.ResolveUrl]]) —
    * relative hrefs against the page url; null for non-absolute bases
    * and same-document fragments.
    */
  def resolve_url(base: Column, ref: Column): Column =
    toColumn(graft.plans.ResolveUrl(toExpr(base), toExpr(ref)))

  def sitemap_children(doc: Column): Column =
    toColumn(graft.plans.SitemapChildren(toExpr(doc)))

  /** HTTP message body octets of a WARC `response` record block (bytes
    * after the first CRLF CRLF / LF LF header separator; null when the
    * block is not an HTTP message — [[graft.plans.HttpBody]]).
    */
  def http_body(block: Column): Column =
    toColumn(graft.plans.HttpBody(toExpr(block)))

  /** Decoded text of an HTTP message block — the full payload chain:
    * strip head, de-chunk `Transfer-Encoding: chunked`, inflate
    * `Content-Encoding: gzip|x-gzip|deflate|zstd`, detect charset (BOM →
    * Content-Type param → `<meta charset>` sniff → UTF-8 validation →
    * windows-1252, the WHATWG order — a BOM outranks every declaration)
    * and decode. Null for non-HTTP blocks and undecodable codings —
    * drop-not-fail ([[graft.plans.HttpText]]).
    */
  def http_text(block: Column): Column =
    toColumn(graft.plans.HttpText(toExpr(block)))

  /** The charset [[http_text]] decodes with (lowercased canonical name) —
    * encoding census over a crawl; null for non-HTTP blocks
    * ([[graft.plans.HttpCharset]]).
    */
  def http_charset(block: Column): Column =
    toColumn(graft.plans.HttpCharset(toExpr(block)))

  /** HTTP status code of a message block; null for non-HTTP
    * ([[graft.plans.HttpStatus]]).
    */
  def http_status(block: Column): Column =
    toColumn(graft.plans.HttpStatus(toExpr(block)))

  /** HTTP header fields of a message block as map<string,string> (names
    * lowercased, last duplicate wins); null for non-HTTP
    * ([[graft.plans.HttpHeaders]]).
    */
  def http_headers(block: Column): Column =
    toColumn(graft.plans.HttpHeaders(toExpr(block)))

  /** Decode a chunked transfer coding; null on malformed framing
    * ([[graft.plans.HttpDechunk]]).
    */
  def http_dechunk(body: Column): Column =
    toColumn(graft.plans.HttpDechunk(toExpr(body)))

  /** Undo one content coding (gzip/x-gzip/deflate/identity); null on
    * corrupt data or unsupported coding ([[graft.plans.HttpInflate]]).
    */
  def http_inflate(body: Column, coding: Column): Column =
    toColumn(graft.plans.HttpInflate(toExpr(body), toExpr(coding)))

  /** Total charset decode (REPLACE on malformed, BOM stripped, WHATWG
    * label substitutions); null for unknown labels
    * ([[graft.plans.CharsetDecode]]).
    */
  def charset_decode(body: Column, charset: Column): Column =
    toColumn(graft.plans.CharsetDecode(toExpr(body), toExpr(charset)))

  /** Charset encode dual (legacy corpora, replay fixtures); null for
    * unknown labels ([[graft.plans.CharsetEncode]]).
    */
  def charset_encode(text: Column, charset: Column): Column =
    toColumn(graft.plans.CharsetEncode(toExpr(text), toExpr(charset)))

  /** Chunked-coding encode dual: fixed-size chunks, CRLF framing, zero
    * last-chunk ([[graft.plans.HttpChunk]]).
    */
  def http_chunk(body: Column, size: Column): Column =
    toColumn(graft.plans.HttpChunk(toExpr(body), toExpr(size)))

  /** RFC 1952 single-member gzip, level 6 ([[graft.plans.GzipCompress]]). */
  def gzip_compress(body: Column): Column =
    toColumn(graft.plans.GzipCompress(toExpr(body)))

  /** RFC 8878 zstandard, level 3 ([[graft.plans.ZstdCompress]]) — the
    * encode dual of the decode chain's `zstd` arm.
    */
  def zstd_compress(body: Column): Column =
    toColumn(graft.plans.ZstdCompress(toExpr(body)))

  /** First declared HTTP transfer/content coding the decode chain cannot
    * undo (today: `br`); null when the block decodes or is not HTTP. The
    * census companion of [[http_text]] — unsupported-coding loss as an
    * observed rate ([[graft.plans.HttpCodingUnsupported]]).
    */
  def http_coding_unsupported(block: Column): Column =
    toColumn(graft.plans.HttpCodingUnsupported(toExpr(block)))

  /** RFC 1950 zlib deflate, level 6 ([[graft.plans.ZlibCompress]]). */
  def zlib_compress(body: Column): Column =
    toColumn(graft.plans.ZlibCompress(toExpr(body)))

  /** Aggregate: exact top-`k` (score desc, id asc) → array<struct<id,
    * score>>. O(k) partial heaps combine map-side — the scale form of a
    * per-group `row_number() <= k` Window, which would shuffle and sort
    * every scored row.
    */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    toColumn(graft.plans.TopKByScoreAgg(
      toExpr(score.cast("double")), toExpr(id.cast("long")), k).toAggregateExpression())

  /** KMV distinct-value sketch buffer: the k smallest DISTINCT longs,
    * ascending (O(k) per partition, map-side mergeable).
    */
  def bottom_k_distinct(v: Column, k: Int): Column =
    toColumn(graft.plans.BottomKDistinctAgg(
      toExpr(v.cast("long")), k).toAggregateExpression())

  /** HLL distinct-count sketch over 60-bit portable hashes in ONE
    * aggregation → struct(zero_regs, harmonic, est) — output-identical to
    * [[graft.quality.CorpusStats.hllDistinct]]'s two-stage relational form,
    * but state-store-friendly (one m-byte buffer per group, element-max
    * merge) so it runs under a streaming windowed aggregation.
    */
  def hll_sketch(hash: Column, m: Int): Column =
    toColumn(graft.plans.HllSketchAgg(
      toExpr(hash.cast("long")), m).toAggregateExpression())

  /** Bounded collect: up to `cap` longs, null once a group exceeds it —
    * the O(cap)-buffer form of collect-then-filter for DF-cutoff posting
    * lists (element order is partition-dependent).
    */
  def capped_collect_longs(v: Column, cap: Int): Column =
    toColumn(graft.plans.CappedCollectLongsAgg(
      toExpr(v.cast("long")), cap).toAggregateExpression())

  /** Portable 60-bit hash of every n-token window (one native pass, no
    * window-string materialization); values = `dh(window)` of the oracle.
    */
  def word_ngram_hashes(text: Column, n: Int): Column =
    toColumn(graft.plans.WordNgramHashes(toExpr(text), n))

  /** Native distinct sliding-window minima over an array<bigint> — the
    * winnowing selection (monotonic deque, O(n)); bit-identical to the
    * declarative transform/slice/array_min + array_distinct form.
    */
  def sliding_min_distinct(hashes: Column, w: Int): Column =
    toColumn(graft.plans.SlidingMinDistinct(toExpr(hashes), w))

  /** Aggregate: element-wise merge of serialized CMS sketches (same
    * width/depth). Second level of the salted two-level merge.
    */
  def cms_merge(sketch: Column): Column =
    toColumn(graft.plans.CmsMergeAgg(toExpr(sketch)).toAggregateExpression())

  /** Canonical key → bytes conversion. ANSI mode forbids numeric→binary
    * casts, so keys normalize through their string form — also what the
    * reference does (printable-ASCII key serializer,
    * `client/.../kafka/PrintableAsciiStringSerializer.java`).
    */
  def key_bytes(c: Column): Column = c.cast("string").cast("binary")

  /** `hi * loPack + lo` composite-key packing with a per-row bound guard:
    * any row where `lo >= loPack` (or either part is negative, or `hi`
    * would overflow the long) RAISES instead of silently colliding with a
    * different (hi, lo) pair — a >= 2^20-token document must fail loudly,
    * not corrupt a dedup election. Two long compares per row; stays inside
    * whole-stage codegen.
    */
  def packed_id(hi: Column, lo: Column, loPack: Long): Column = {
    val hiBound = Long.MaxValue / loPack
    org.apache.spark.sql.functions.when(
      hi >= 0 && hi < hiBound && lo >= 0 && lo < loPack, hi * loPack + lo)
      .otherwise(org.apache.spark.sql.functions.raise_error(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit(
            s"packed_id: key outside packing bounds (hi < $hiBound, lo < $loPack): hi="),
          hi.cast("string"),
          org.apache.spark.sql.functions.lit(" lo="), lo.cast("string"))))
  }

  /** Native dot product over array<float|double> (left-to-right double
    * accumulation — same result as the declarative aggregate/zip_with fold).
    */
  def vector_dot(a: Column, b: Column): Column =
    toColumn(graft.plans.VectorDot(toExpr(a), toExpr(b)))

  /** Native integer dot product over array<long> (the int8-quantized tier;
    * exact — integer addition is order-free). Null semantics match the
    * declarative fold: length mismatch or null element → null.
    */
  def vector_dot_long(a: Column, b: Column): Column =
    toColumn(graft.plans.VectorDotLong(toExpr(a), toExpr(b)))

  /** Native sign-LSH bucket id (`planes` hyperplane sign bits packed into a
    * long); bit-identical to the declarative hyperplane fold. `planeOffset`
    * selects an independent hyperplane family (table t of b planes passes
    * t*b) for multi-table LSH.
    */
  def sign_lsh(vec: Column, planes: Int, planeOffset: Int = 0): Column =
    toColumn(graft.plans.SignLsh(toExpr(vec), planes, planeOffset))

  /** Native k-wide minhash signature (array of k longs) over character
    * `shingleSize`-grams; bit-identical to the declarative explode→md5→min
    * pipeline it replaces.
    */
  def minhash_sigs(text: Column, shingleSize: Int, k: Int): Column =
    toColumn(graft.plans.MinHashSigs(toExpr(text), shingleSize, k))

  /** Native `bits`-bit simhash over single-space tokens; bit-identical to
    * the declarative explode(tokens)×explode(bits)→majority-vote pipeline.
    */
  def sim_hash(text: Column, bits: Int): Column =
    toColumn(graft.plans.SimHash(toExpr(text), bits))

  /** Decode arbitrary protobuf payload bytes per a [[graft.core.ProtoSchema]]
    * descriptor → struct; null on malformed input.
    */
  def proto_decode(c: Column, schema: graft.core.ProtoSchema): Column =
    toColumn(ProtoDecode(toExpr(c), schema))

  /** Encode a struct (laid out as the descriptor's spark schema) → protobuf
    * wire bytes.
    */
  def proto_encode(c: Column, schema: graft.core.ProtoSchema): Column =
    toColumn(ProtoEncode(toExpr(c), schema))

  /** Decode the legacy value envelope → struct(meta, task); null if invalid. */
  def legacy_envelope_decode(c: Column): Column =
    toColumn(LegacyEnvelopeDecode(toExpr(c)))

  /** Encode (metadata struct, task bytes) → legacy envelope bytes. */
  def legacy_envelope_encode(meta: Column, task: Column): Column =
    toColumn(LegacyEnvelopeEncode(toExpr(meta), toExpr(task)))
}
