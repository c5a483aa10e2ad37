package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 top-k text retrieval over a space-tokenized corpus — the classic
  * sparse ranking function (Robertson & Zaragoza 2009, "The Probabilistic
  * Relevance Framework: BM25 and Beyond"), using the non-negative
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant that Lucene adopted.
  * In a training-data pipeline this is the retrieval half of targeted
  * curation: "find the documents that look like this query" without an
  * embedding model — and the standard lexical baseline an ANN index
  * (graft.similarity.Knn) is measured against.
  *
  * 100 TB shape: the query set is tiny and known up front, so there is no
  * inverted index and no posting-list shuffle at all —
  *   - pass 1 aggregates the whole corpus to ONE row (docCount, total token
  *     count, one `df` counter per distinct query term) with map-side
  *     partial aggregation; the driver keeps only those scalars (the
  *     k-means/DSIR residency pattern);
  *   - pass 2 re-scans, computes every per-(doc, query) score row-locally
  *     (token arrays never leave their row, text never shuffles), and
  *     reduces through [[graft.functions.top_k_by]]'s O(k) partial heaps —
  *     the only exchange is `numQueries` heap buffers.
  * Both passes are whole-stage-codegen'd; nothing quadratic, nothing
  * driver-resident beyond the per-term scalar table.
  *
  * Engine-portable determinism (the pq26/pq48 fixed-point contract): each
  * per-(doc, term) BM25 component is frozen to `floor(1e6 · idf · w)` as an
  * integer — per-doc scores are integer sums, so partition order cannot
  * change a result — and the reported double score is recovered by one IEEE
  * division at the very end.
  *
  * The reference engine (line/decaton) has no retrieval surface; this sits
  * in the engine's added capability layer next to the ANN stack.
  */
object Bm25 {

  /** Rank `docs` against each query and return the top `k` per query.
    *
    * @param docs    corpus; one row per document
    * @param idCol   integral document id (feeds the bounded-heap top-k)
    * @param textCol space-tokenized text column
    * @param queries (queryId, bag of query terms) — bounded, broadcast as
    *                literals; a term may repeat across queries (df counted
    *                once)
    * @return (qid, rank, doc_id, score_fp, score) — rank 1..k by
    *         (score desc, doc_id asc); only documents matching >=1 term
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(queries.nonEmpty, "need at least one query")
    require(queries.forall(_._2.nonEmpty), "every query needs >= 1 term")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids: their term sets would merge into one top-k group " +
        "and the same doc could take multiple ranks")
    graft.functions.requireIntegralId(docs, idCol, "bm25TopK")
    val terms: Seq[String] = queries.flatMap(_._2).distinct

    // null-text docs carry no terms but size(null) = -1 would CORRUPT the
    // corpus statistics below (n_docs counts them, sum_dl decrements) and
    // through avgdl every document's score — exclude them from the model
    val base = docs
      .filter(textCol.isNotNull)
      .select(idCol.as("doc_id"), split(textCol, " ").as("t"))
      .withColumn("dl", size(col("t")))

    // pass 1: corpus statistics — partial-agged scan to a single row; the
    // model that survives on the driver is one Long per distinct term.
    val statAggs =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("t"), t), 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = base.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val nDocs = stats.getLong(0)
    require(nDocs > 0, "empty corpus")
    val dfByTerm = terms.zipWithIndex.map { case (t, i) => t -> stats.getLong(2 + i) }.toMap
    scoreWithModel(base, queries, k, k1, b, nDocs, stats.getLong(1), dfByTerm)
  }

  /** Incremental corpus-stats maintenance for BM25 — the retrieval member
    * of the round-16 segment family (ANN: `Knn.appendIvfDelta`; near-dup:
    * `StreamOps.flagAndIndexBandedBatch`). BM25's corpus model is three
    * ADDITIVE counters — docCount, total token count, per-term df — so a
    * streaming corpus maintains it as one tiny stats segment per
    * micro-batch (overwritten by durable batch id: idempotent under
    * replay), and scoring merges segments instead of re-scanning the whole
    * corpus per query batch. Unlike [[bm25TopK]]'s inline pass (df only
    * for the CURRENT query's terms), segments carry df for EVERY distinct
    * term in the batch, so future queries with unseen terms need no
    * re-scan; the merge collects only the query terms' rows (bounded).
    * Segment size = the batch's vocabulary — fixed-width rows, vocabulary
    * grows sublinearly in corpus size.
    */
  def appendBm25StatsSegment(
      batch: DataFrame,
      batchId: Long,
      statsDir: String,
      idCol: Column,
      textCol: Column): Unit = {
    val base = batch
      .filter(textCol.isNotNull)
      .select(split(textCol, " ").as("t"))
      .withColumn("dl", size(col("t")))
    val termRows = base
      .select(explode(array_distinct(col("t"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"), lit(0L).as("n_docs"), lit(0L).as("sum_dl"))
    val totalsRow = base
      .agg(count(lit(1)).as("n_docs"), coalesce(sum(col("dl").cast("long")), lit(0L)).as("sum_dl"))
      .select(lit(null).cast("string").as("term"), lit(0L).as("df"),
        col("n_docs"), col("sum_dl"))
    termRows.unionByName(totalsRow)
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
  }

  /** Merge the stats segments into the (nDocs, sumDl, df) model for the
    * given terms: distributed sums, driver collects |terms|+1 scalars.
    */
  def bm25ModelFromSegments(
      spark: org.apache.spark.sql.SparkSession,
      statsDir: String,
      terms: Seq[String]): (Long, Long, Map[String, Long]) = {
    val seg = spark.read.parquet(statsDir)
    val totals = seg.filter(col("term").isNull)
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("s")).collect()(0)
    val dfs = seg.filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (totals.getLong(0), totals.getLong(1), dfs)
  }

  /** [[bm25TopK]] with the corpus model taken from the stats segments
    * instead of an inline pass-1 scan. Identical integers to the inline
    * form over the same corpus (asserted in Bm25Spec; dq30 hash-checks it
    * against the same oracle as pq53): df/doc/length counters are additive,
    * so WHEN a document's batch arrived cannot change a score.
    */
  def bm25TopKIncremental(
      spark: org.apache.spark.sql.SparkSession,
      statsDir: String,
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val (nDocs, sumDl, dfByTerm) =
      bm25ModelFromSegments(spark, statsDir, queries.flatMap(_._2).distinct)
    val base = docs
      .filter(textCol.isNotNull)
      .select(idCol.as("doc_id"), split(textCol, " ").as("t"))
      .withColumn("dl", size(col("t")))
    scoreWithModel(base, queries, k, k1, b, nDocs, sumDl, dfByTerm)
  }

  /** The scoring pass of [[bm25TopK]] against an EXPLICIT corpus model —
    * what lets the model come from somewhere other than an inline pass-1
    * scan (the incremental stats segments above, a cached model reused
    * across query batches, a model computed at a different watermark). The
    * integers are identical to the inline path's by construction: idf is
    * derived here from the raw (nDocs, sumDl, df) longs, so where the
    * counts came from cannot change a score.
    */
  private def scoreWithModel(
      base: DataFrame,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1: Double,
      b: Double,
      nDocs: Long,
      sumDl: Long,
      dfByTerm: Map[String, Long]): DataFrame = {
    require(nDocs > 0, "empty corpus model")
    val avgdl = sumDl.toDouble / nDocs
    val idf: Map[String, Double] = queries.flatMap(_._2).distinct.map { t =>
      val df = dfByTerm.getOrElse(t, 0L)
      t -> math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap

    // pass 2: row-local scoring. The oracle replicates every operation in
    // this exact association order, so keep the expression shapes in sync
    // with the pq53 SQL if editing.
    def tf(term: String): Column =
      size(filter(col("t"), x => x === lit(term))).cast("double")
    def comp(term: String): Column = {
      val tfc = tf(term)
      val w = tfc * lit(k1 + 1.0) /
        (tfc + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
      when(tfc > 0d, floor(lit(1e6) * lit(idf(term)) * w).cast("long")).otherwise(0L)
    }
    val perQuery = queries.map { case (qid, qterms) =>
      struct(
        lit(qid).as("qid"),
        qterms.map(comp).reduce(_ + _).as("score_fp"),
        qterms.map(t => when(tf(t) > 0d, 1).otherwise(0)).reduce(_ + _).as("nt"))
    }
    base
      .select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("doc_id"), col("q.qid").as("qid"), col("q.score_fp").as("score_fp"),
        col("q.nt").as("nt"))
      .filter(col("nt") > 0)
      .groupBy(col("qid"))
      .agg(graft.functions.top_k_by(col("score_fp"), col("doc_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(
        col("qid"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"),
        col("col.score").cast("long").as("score_fp"),
        (col("col.score") / lit(1e6)).as("score"))
  }
}
