package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.cosine
import graft.functions.TextFunctions.portable_hash

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. Query set broadcast against the
  *    corpus — one scan of the corpus per batch of queries, no corpus
  *    self-shuffle. Right answer for small query batches and the recall
  *    baseline for everything else.
  *  - [[signLshTopK]]: random-hyperplane (sign) LSH. Each vector gets a
  *    `planes`-bit bucket; candidates share a bucket (multi-probe via
  *    Hamming-adjacent buckets optional). At 100 TB the corpus is scanned
  *    once to bucket, and the quadratic step runs only inside buckets —
  *    the standard scale path when exact top-k over everything is
  *    unaffordable.
  *
  * Hyperplanes are derived deterministically from [[portable_hash]] of
  * (plane, dim) so results are reproducible across runs and engines — no RNG
  * state on the driver.
  */
object Knn {

  /** Exact per-query top-k via the bounded-heap aggregate
    * ([[graft.plans.TopKByScoreAgg]]): O(k) partial heaps combine map-side,
    * so the exchange carries partitions×queries×k fixed-width rows where
    * the former Window form shuffled and sorted EVERY scored candidate —
    * at 100 TB, the difference between shuffling the corpus's scores and
    * shuffling kilobytes. Output identical to the Window form under the
    * total order (score desc, id asc); CurationOpsSpec asserts equality
    * including ties, the registered-query oracles hash-check it.
    */
  private[similarity] def rankTopK(
      scored: DataFrame, scoreName: String, k: Int,
      longScore: Boolean = false): DataFrame = {
    val out = scored.groupBy(col("query_id"))
      .agg(graft.functions.top_k_by(col(scoreName), col("nbr_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
    // integer scores ride the double heap exactly (|score| << 2^53)
    val sc = if (longScore) col("e.score").cast("long") else col("e.score")
    out.select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
      col("e.id").as("nbr_id"), sc.as(scoreName))
  }

  /** Exact top-k neighbors for each query row (queries small ⇒ broadcast). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nv"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = c.join(q, col("query_id") =!= col("nbr_id"))
      .withColumn("cos_r", round(cosine(col("qv"), col("nv")), 4))
    rankTopK(scored, "cos_r", k)
  }

  /** Hard-negative mining for contrastive training (the in-batch-negatives
    * upgrade of SimCLR/DPR-style pipelines): for each anchor, the top-`k`
    * most cosine-similar corpus items with a DIFFERENT label — the
    * negatives that actually move a contrastive loss. Same scale shape as
    * [[bruteForceTopK]] (anchors broadcast, corpus scanned once, bounded-
    * heap top-k; the label inequality rides the broadcast join condition,
    * so same-label candidates are dropped before scoring ever shuffles).
    * Output is pq08's (query_id, rank, nbr_id, cos_r) shape; membership —
    * not an output column — encodes the label constraint.
    */
  def hardNegativesTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("nbr_id"), col(labelCol).as("nbr_label"), col(vecCol).as("nv"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(labelCol).as("q_label"), col(vecCol).as("qv")))
    val scored = c
      .join(q, col("query_id") =!= col("nbr_id") && col("q_label") =!= col("nbr_label"))
      .withColumn("cos_r", round(cosine(col("qv"), col("nv")), 4))
    rankTopK(scored, "cos_r", k)
  }

  /** Symmetric absmax int8 quantization of a float-vector column — same
    * math as the pq29 registered query (floor, not round: floor of an IEEE
    * double is bit-identical across engines). Zero vectors quantize to
    * zeros. Row-local.
    */
  def quantizeInt8(v: Column): Column = {
    val am = array_max(transform(v, x => abs(x)))
    when(am === lit(0f), transform(v, _ => lit(0L)))
      .otherwise(transform(v,
        x => floor(x.cast("double") / am.cast("double") * lit(127.0)).cast("long")))
  }

  /** Brute-force top-k on int8-quantized vectors: the rescoring tier of a
    * quantized ANN stack. INTEGER dot products end to end, so unlike the
    * float path (which must round cosines for the oracle) the entire
    * result — scores, ordering, top-k membership — is bit-exact and fully
    * hash-checkable. Same scale shape as [[bruteForceTopK]]: queries
    * broadcast, corpus scanned once, one window shuffle for top-k; the
    * integer dot is the native [[graft.plans.VectorDotLong]] (a generated
    * tight loop — the declarative zip_with/aggregate fold interprets two
    * Catalyst lambdas per element and blocks whole-stage codegen around
    * the scoring projection; the int8 layout is what a columnar SIMD
    * kernel wants at 100 TB).
    */
  def int8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), quantizeInt8(col(vecCol)).as("nq"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), quantizeInt8(col(vecCol)).as("qq")))
    val scored = c.join(q, col("query_id") =!= col("nbr_id"))
      .withColumn("score", graft.functions.vector_dot_long(col("qq"), col("nq")))
    rankTopK(scored, "score", k, longScore = true)
  }

  /** MMR result diversification (Carbonell & Goldstein 1998): re-rank each
    * query's top-`m` int8 candidates down to `k` results, greedily picking
    * `argmax wRel·rel(c) − wDiv·max_{s∈selected} sim(c,s)` each round
    * (λ = wRel/(wRel+wDiv); the first pick is pure relevance, i.e. the
    * unselected max-sim term is 0). All relevances and similarities are
    * INTEGER dot products of int8-quantized vectors, so selection and every
    * reported score are bit-exact — an oracle that unrolls the same `k`
    * rounds reproduces them hash-identically despite the iterative argmax.
    *
    * 100 TB shape: the corpus-scale work is the [[int8TopK]] scoring scan
    * (queries broadcast, one bounded-heap exchange) plus one broadcast
    * semi-join fetch of the ≤ queries×m candidate vectors; the greedy loop
    * itself runs on the driver over that bounded set (k-means-style
    * residency — queries×m×d ints, kilobytes), never touching the corpus
    * again. Ids are contractually integral (cast to long for the residency
    * map); string ids need a surrogate key first.
    */
  def mmrTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      wRel: Long,
      wDiv: Long): DataFrame = {
    require(k <= m, s"k=$k must be <= candidate pool m=$m")
    // fail at plan time, not mid-job: the driver-resident greedy loop keys
    // its candidate map by long id, so a non-integral id column (e.g. a
    // String doc id) must be surrogate-keyed by the caller first
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idType = corpus.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
        s"mmrTopK requires an integral id column; '$idCol' is $idType — " +
          "add a surrogate key (e.g. monotonically_increasing_id or a " +
          "zipWithIndex join) before re-ranking")
    }
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val cand = int8TopK(corpus, queries, idCol, vecCol, m)
      .select(col("query_id"), col("nbr_id"), col("score").as("rel"))
    val candRows = cand.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs =
      mmrCandidateFetch(corpus, idCol, vecCol, candRows.map(_._2).distinct.toSeq)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum

    val picked = candRows.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      val pool = scala.collection.mutable.Set(cs.map(c => (c._2, c._3)): _*)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long, Long)]
      while (sel.size < k && pool.nonEmpty) {
        val scored = pool.toSeq.map { case (id, rel) =>
          val msim = if (sel.isEmpty) 0L
            else sel.map(s => dot(vecs(id), vecs(s._3))).max
          (id, rel, wRel * rel - wDiv * msim)
        }
        val (id, rel, mmr) = scored.minBy { case (id, _, mmr) => (-mmr, id) }
        sel += ((q, sel.size + 1, id, rel, mmr))
        pool.remove((id, rel))
      }
      sel
    }
    picked.toDF("query_id", "rank", "nbr_id", "rel", "mmr")
  }

  /** [[mmrTopK]]'s candidate-vector fetch: a BROADCAST SEMI-JOIN on the
    * ≤ queries×m distinct candidate ids. An `isin` of that many literals
    * bloats the plan past codegen limits and analyzes in O(literals) per
    * scan row; the semi-join is one hashed-relation probe regardless of
    * candidate count, with zero data Exchange (PlanAuditSpec pins both).
    */
  private[graft] def mmrCandidateFetch(
      corpus: DataFrame, idCol: String, vecCol: String,
      candIds: Seq[Long]): DataFrame = {
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    corpus
      .join(broadcast(candIds.toDF("cand_id")),
        col(idCol) === col("cand_id"), "left_semi")
      .select(col(idCol).cast("long").as("id"), quantizeInt8(col(vecCol)).as("v"))
  }

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5).
    * (Declarative twin of the native SignLsh expression's component math —
    * kept for the equivalence test in DedupSpec.)
    */
  private[graft] def planeComponent(plane: Column, dim: Column): Column =
    (portable_hash(concat_ws(":", plane, dim)) % 1000000L).cast("double") / 2000000.0

  /** Sign-LSH bucket id (`planes` bits) for each row's vector — ONE native
    * expression per row ([[graft.plans.SignLsh]]), no explode, no shuffle.
    * (The original declarative form exploded a row per plane, paid a
    * Catalyst lambda per element, and re-grouped by id — a full shuffle just
    * to assign buckets; see [[declarativeLshBuckets]], retained as its
    * equivalence oracle.)
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, planes: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.sign_lsh(col(vecCol), planes).as("bucket"))

  /** The pre-native declarative bucket pipeline; bit-identical to
    * [[lshBuckets]] (asserted in DedupSpec), kept as the equivalence oracle
    * for the native expression.
    */
  private[graft] def declarativeLshBuckets(
      df: DataFrame, idCol: String, vecCol: String, planes: Int,
      planeOffset: Int = 0): DataFrame = {
    val withDims = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), explode(sequence(lit(0), lit(planes - 1))).as("p"))
    // dot(v, plane_{p+offset}) via an index fold over the vector
    val dot = aggregate(
      zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
        (x, i) => x.cast("double") * planeComponent(col("p") + planeOffset, i)),
      lit(0.0), (acc, x) => acc + x)
    withDims
      .withColumn("bit", when(dot >= 0, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("id"))
      .agg(sum(when(col("bit") === 1, expr("shiftleft(1L, cast(p as int))")).otherwise(0L)).as("bucket"))
  }

  /** Multi-probe expansion of [[lshBuckets]]: each id appears under its home
    * bucket plus (with `probes = 1`) every bucket one bit-flip away —
    * `planes + 1` rows per id. A near neighbor whose sign pattern differs on
    * exactly one plane is then still found, which is the dominant miss mode
    * for highly-similar vectors (P[≥2 planes flip] ≪ P[1 plane flips]).
    * Standard multi-probe LSH; costs a small constant fan-out, never a wider
    * shuffle key space.
    */
  def lshProbes(df: DataFrame, idCol: String, vecCol: String, planes: Int, probes: Int): DataFrame =
    lshProbesFromHome(lshBuckets(df, idCol, vecCol, planes), planes, probes)

  /** Probe expansion over an already-computed `(id, bucket)` home frame —
    * the row-local half of [[lshProbes]], factored out so callers that
    * already hold home buckets don't re-derive them through the hyperplane
    * dots. NOTE Spark still evaluates each JOIN BRANCH's lineage
    * independently: when the same home frame feeds both sides of a
    * candidate join and the vector column is expensive, pin it
    * (`localCheckpoint`) to actually share the computation.
    */
  def lshProbesFromHome(home: DataFrame, planes: Int, probes: Int): DataFrame = {
    require(probes == 0 || probes == 1, "only probe distance 0 or 1 supported")
    if (probes == 0) home
    else home
      .select(col("id"), col("bucket"), explode(sequence(lit(0), lit(planes))).as("j"))
      .withColumn("bucket",
        when(col("j") === 0, col("bucket"))
          .otherwise(expr("bucket ^ shiftleft(1L, cast(j - 1 as int))")))
      .select(col("id"), col("bucket"))
  }

  /** (id, tbl, bucket) under `tables` INDEPENDENT hyperplane families, in
    * one corpus pass: table t hashes planes [t*planes, (t+1)*planes), and
    * the per-table buckets posexplode from one array of native sign_lsh
    * values — constant fan-out, no extra scan. Multi-table LSH is the
    * standard recall lever (union of tables: 1-(1-r)^L) that probing alone
    * can't reach once the per-table match probability is low.
    */
  def lshTableBuckets(
      df: DataFrame, idCol: String, vecCol: String, planes: Int, tables: Int): DataFrame = {
    require(tables >= 1, s"tables must be >= 1, got $tables")
    df.select(col(idCol).as("id"),
      posexplode(array((0 until tables).map(t =>
        graft.functions.sign_lsh(col(vecCol), planes, t * planes)): _*)))
      .toDF("id", "tbl", "bucket")
  }

  /** Multi-probe expansion of [[lshTableBuckets]]: per table, the home
    * bucket plus (probes = 1) every one-bit-flip bucket.
    */
  def lshTableProbes(
      df: DataFrame, idCol: String, vecCol: String,
      planes: Int, tables: Int, probes: Int): DataFrame = {
    require(probes == 0 || probes == 1, "only probe distance 0 or 1 supported")
    val home = lshTableBuckets(df, idCol, vecCol, planes, tables)
    if (probes == 0) home
    else home
      .select(col("id"), col("tbl"), col("bucket"),
        explode(sequence(lit(0), lit(planes))).as("j"))
      .withColumn("bucket",
        when(col("j") === 0, col("bucket"))
          .otherwise(expr("bucket ^ shiftleft(1L, cast(j - 1 as int))")))
      .select(col("id"), col("tbl"), col("bucket"))
  }

  /** IVF coarse quantizer: `nlist` centroids drawn deterministically from
    * the corpus itself (the ids with the smallest portable hash under an
    * "ivf:" salt — reproducible across runs and engines, no driver RNG, and
    * data-adaptive in the way random hyperplanes are not). At 100 TB this is
    * one `TakeOrderedAndProject` over (hash, id) — no shuffle of vectors.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .orderBy(portable_hash(concat_ws(":", lit("ivf"), col("cid"))).asc, col("cid").asc)
      .limit(nlist)

  /** Assign every row to its nearest centroid by cosine: one broadcast
    * nested-loop over `nlist` centroids + a max_by — a narrow pass, no
    * shuffle of the corpus. Returns (id, cid). Ties break to the SMALLEST
    * centroid id (the struct ordering compares (cos, -cid) lexicographically)
    * — the kmeans/pq39 tie contract, which is what lets an SQL oracle replay
    * the assignment as `row_number() OVER (ORDER BY cos DESC, cid ASC)`.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .groupBy(col("id"))
      .agg(max_by(col("cid"),
        struct(cosine(col("v"), col("cvec")).as("c"), (-col("cid")).as("nc"))).as("cid"))

  /** IVF approximate top-k — the inverted-file alternative to sign-LSH
    * (pq09): corpus vectors are bucketed by nearest centroid, and each query
    * searches only its `nprobe` nearest centroid lists. Scale shape: the
    * corpus is scanned once for assignment, the search joins on the coarse
    * list id, and nlist/nprobe trade recall for candidate volume exactly as
    * in a production IVF index. Recall vs [[bruteForceTopK]] asserted in
    * DedupSpec.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe=$nprobe must be in [1, nlist=$nlist]")
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist)
    val assigned = ivfAssign(corpus, idCol, vecCol, cents)
      .withColumnRenamed("id", "nbr_id")
    // per query: its nprobe closest centroids (centroids broadcast; the
    // query set is small by contract, same as bruteForceTopK)
    val w = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cid").asc)
    val qprobes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("qv"), col("cvec")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cid"))
    val cands = assigned.join(broadcast(qprobes), Seq("cid"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id")).distinct()
    val scored = cands
      .join(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nv")), "nbr_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), "query_id")
      .withColumn("cos_r", round(cosine(col("qv"), col("nv")), 4))
    rankTopK(scored, "cos_r", k)
  }

  /** A PERSISTED IVF index (the production posture — `ivfTopK` recomputes
    * centroid lists inline on every run, which at 100 TB re-scans the corpus
    * per query batch): the coarse-quantizer assignment is materialized ONCE
    * as an external bucketed table ([[graft.sources.Bucketing]]) keyed and
    * bucketed by the inverted-list id `cid`, carrying each vector in both
    * float and int8 form; the tiny centroid table persists alongside it.
    * Probes then read ONLY the probed lists: the probe cid set is a bounded
    * driver-resident literal list (≤ queries × nprobe ids — the same
    * k-means-style residency contract as `mmrTopK`), so the `cid IN (...)`
    * filter bucket-prunes the scan to nprobe/nlist of the index files.
    * Rebuild when the corpus changes (an IVF index is a snapshot — same as
    * any ANN system's).
    */
  def buildIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      tableName: String,
      path: String,
      buckets: Int,
      pqCodebooks: Option[Seq[Seq[Seq[Double]]]] = None,
      centroids: Option[DataFrame] = None): Unit = {
    val spark0 = corpus.sparkSession
    // `centroids` lets a rebuild FREEZE an earlier coarse quantizer (the
    // incremental-maintenance contract: deltas were assigned against those
    // centroids, so an equivalence rebuild must use the same ones)
    val cents = centroids.getOrElse(ivfCentroids(corpus, idCol, vecCol, nlist))
    // sibling path, not nested: the bucketed overwrite below clears `path`
    cents.write.mode("overwrite").format("parquet")
      .option("path", s"${path}_centroids").saveAsTable(s"${tableName}_centroids")
    val payload = corpus.select(
      Seq(col(idCol).as("nbr_id"), col(vecCol).as("nv"),
        quantizeInt8(col(vecCol)).as("nq")) ++
      // the IVFx,PQy layout: m one-byte codes beside the list id — the
      // representation a codes-only probe (ivfPqProbeTopK) reads, leaving
      // nv/nq columns unscanned via parquet column pruning
      pqCodebooks.map(cb => Pq.codesFor(col(vecCol), cb).as("codes")).toSeq: _*)
    val assigned = ivfAssign(corpus, idCol, vecCol, spark0.table(s"${tableName}_centroids"))
      .withColumnRenamed("id", "nbr_id")
      .join(payload, "nbr_id")
    graft.sources.Bucketing.writeBucketed(
      assigned, tableName, path, buckets, keys = Seq("cid"), sortCols = Seq("cid"))
  }

  /** Incremental index maintenance — append a batch of newly-arrived vectors
    * to a [[buildIvfIndex]]-persisted index WITHOUT rebuilding it. The
    * production posture for a streaming corpus (the reference's quota/state
    * machinery has no ANN analog; this is the LSM discipline every serving
    * ANN system uses):
    *
    *   - centroids are FROZEN: new vectors are assigned against the
    *     persisted `<table>_centroids` (row-local broadcast argmax, no
    *     shuffle of history, no index rewrite);
    *   - each batch lands as its own delta segment
    *     `deltaPath/batch=<batchId>` written in OVERWRITE mode, so a
    *     checkpoint replay of the same batch id rewrites its own segment
    *     instead of duplicating it (the [[graft.streaming.StreamOps
    *     .effectivelyOnceParquet]] idempotency discipline);
    *   - segments are sorted by `cid` so a probe's `cid IN (...)` filter
    *     prunes delta row-groups via parquet min/max stats — the delta
    *     analog of the base table's bucket pruning;
    *   - compaction = a frozen-centroid [[buildIvfIndex]] over
    *     base ∪ deltas (the `centroids` parameter), after which the delta
    *     directory can be dropped.
    *
    * Probe-visibility of the deltas is [[ivfProbeTopKIncremental]].
    */
  def appendIvfDelta(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      deltaPath: String,
      newRows: DataFrame,
      idCol: String,
      vecCol: String,
      batchId: Long,
      pqCodebooks: Option[Seq[Seq[Seq[Double]]]] = None): Unit = {
    val payload = newRows.select(
      Seq(col(idCol).as("nbr_id"), col(vecCol).as("nv"),
        quantizeInt8(col(vecCol)).as("nq")) ++
      pqCodebooks.map(cb => Pq.codesFor(col(vecCol), cb).as("codes")).toSeq: _*)
    val assigned = ivfAssign(newRows, idCol, vecCol,
        spark.table(s"${tableName}_centroids"))
      .withColumnRenamed("id", "nbr_id")
      .join(payload, "nbr_id")
      .sortWithinPartitions("cid")
    assigned.write.mode("overwrite").parquet(s"$deltaPath/batch=$batchId")
  }

  /** The index as probes see it: bucketed base ∪ delta segments (if any).
    * A `cid` filter over the union bucket-prunes the base side and
    * row-group-prunes the delta side — neither arm scans unprobed lists.
    */
  private[graft] def ivfIndexWithDelta(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      deltaPath: String): DataFrame = {
    val base = graft.sources.Bucketing.readBucketed(spark, tableName)
    val hasDelta = {
      val p = java.nio.file.Paths.get(deltaPath)
      java.nio.file.Files.isDirectory(p) && scala.util.Using.resource(
        java.nio.file.Files.list(p))(_.findFirst().isPresent)
    }
    if (!hasDelta) base
    // select(base columns) drops the partition-discovery `batch` column so
    // the two arms union by identical schema
    else base.unionByName(
      spark.read.parquet(deltaPath).select(base.columns.map(col): _*))
  }

  /** [[ivfProbeTopK]] over base + deltas: identical to a probe against a
    * frozen-centroid rebuild of the full corpus at the same watermark
    * (asserted in IvfIncrementalSpec — assignment is row-local and
    * deterministic, so WHERE a vector lives cannot depend on when it
    * arrived).
    */
  def ivfProbeTopKIncremental(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      deltaPath: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame =
    ivfProbeTopKOver(spark, ivfIndexWithDelta(spark, tableName, deltaPath),
      tableName, queries, idCol, vecCol, k, nprobe)

  /** Compaction: fold the delta segments back into bucketed form as a NEW
    * index (blue/green — the old table keeps serving while this writes, the
    * caller swaps names when it lands, then deletes `deltaPath`). No
    * re-assignment happens: delta rows were already assigned against the
    * frozen centroids, so compaction is a pure re-bucketing of
    * already-final rows; the centroid table is copied verbatim. Probes
    * against (newTable, empty delta) equal probes against (old table,
    * deltas) by construction — asserted in IvfIncrementalSpec.
    */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      deltaPath: String,
      newTableName: String,
      newPath: String,
      buckets: Int): Unit = {
    val combined = ivfIndexWithDelta(spark, tableName, deltaPath)
    spark.table(s"${tableName}_centroids")
      .write.mode("overwrite").format("parquet")
      .option("path", s"${newPath}_centroids")
      .saveAsTable(s"${newTableName}_centroids")
    graft.sources.Bucketing.writeBucketed(
      combined, newTableName, newPath, buckets, keys = Seq("cid"), sortCols = Seq("cid"))
  }

  /** [[ivfTopK]] against a [[buildIvfIndex]]-persisted index: same results
    * as the inline form over the same corpus (both derive the same
    * deterministic centroids), but the corpus is never re-assigned and the
    * scan touches only the probed inverted lists (bucket pruning — asserted
    * in PlanAuditSpec/DedupSpec).
    */
  def ivfProbeTopK(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame =
    ivfProbeTopKOver(spark, graft.sources.Bucketing.readBucketed(spark, tableName),
      tableName, queries, idCol, vecCol, k, nprobe)

  private def ivfProbeTopKOver(
      spark: org.apache.spark.sql.SparkSession,
      index: DataFrame,
      tableName: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val cents = spark.table(s"${tableName}_centroids")
    val w = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cid").asc)
    val qprobes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("qv"), col("cvec")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cid"))
    // literal probe-list: what turns the join key into a bucket-prunable
    // scan filter. Bounded by contract (queries small, like bruteForceTopK).
    val probeCids = qprobes.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = index.filter(col("cid").isin(probeCids: _*))
    val scored = idx.join(broadcast(qprobes), Seq("cid"))
      .filter(col("query_id") =!= col("nbr_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), "query_id")
      .withColumn("cos_r", round(cosine(col("qv"), col("nv")), 4))
      .select(col("query_id"), col("nbr_id"), col("cos_r")).distinct()
    rankTopK(scored, "cos_r", k)
  }

  /** The codes-only probe over a [[buildIvfIndex]] persisted WITH
    * `pqCodebooks` — the full shipped IVF-PQ posture: the scan is bucket-
    * pruned to the probed lists AND column-pruned to `(nbr_id, cid,
    * codes)`, so query time reads nprobe/nlist of an m-bytes-per-vector
    * table while the float/int8 columns stay on disk for rescoring tiers.
    * Same integer ADC scores as [[Pq.ivfAdcTopK]] over the same corpus
    * (both derive the same deterministic centroids) — asserted in PqSpec
    * together with the bucket pruning.
    */
  def ivfPqProbeTopK(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Seq[Seq[Seq[Double]]],
      k: Int,
      nprobe: Int): DataFrame =
    ivfPqProbeTopKOver(spark, graft.sources.Bucketing.readBucketed(spark, tableName),
      tableName, queries, idCol, vecCol, cb, k, nprobe)

  /** [[ivfPqProbeTopK]] over base + delta segments — the codes-only probe
    * against an incrementally-maintained index (deltas written by
    * [[appendIvfDelta]] WITH the same `pqCodebooks`, so their `codes`
    * column exists and was encoded by the same codebooks).
    */
  def ivfPqProbeTopKIncremental(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      deltaPath: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Seq[Seq[Seq[Double]]],
      k: Int,
      nprobe: Int): DataFrame =
    ivfPqProbeTopKOver(spark, ivfIndexWithDelta(spark, tableName, deltaPath),
      tableName, queries, idCol, vecCol, cb, k, nprobe)

  private def ivfPqProbeTopKOver(
      spark: org.apache.spark.sql.SparkSession,
      index: DataFrame,
      tableName: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Seq[Seq[Seq[Double]]],
      k: Int,
      nprobe: Int): DataFrame = {
    val cents = spark.table(s"${tableName}_centroids")
    val w = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cid").asc)
    val qprobes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("qv"), col("cvec")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cid"))
    val probeCids = qprobes.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = index
      .filter(col("cid").isin(probeCids: _*))
      .select(col("cid"), col("nbr_id"), col("codes"))
    val scored = idx.join(broadcast(qprobes), Seq("cid"))
      .filter(col("query_id") =!= col("nbr_id"))
      .join(broadcast(Pq.queryTables(queries, idCol, vecCol, cb)), "query_id")
      .withColumn("score_fp",
        aggregate(zip_with(col("codes"), col("qtab"),
          (c, tab) => element_at(tab, (c + 1).cast("int"))), lit(0L), _ + _))
      .select(col("query_id"), col("nbr_id"), col("score_fp")).distinct()
    rankTopK(scored, "score_fp", k, longScore = true)
  }

  /** The production quantized-ANN stack, composed: IVF coarse candidate
    * generation (pq14's tier) → int8 integer-dot rescoring (pq31's tier)
    * → exact float re-rank of the few survivors. Scale shape per tier:
    *
    *   1. coarse: corpus scanned once for centroid assignment, candidates
    *      restricted to each query's `nprobe` nearest inverted lists —
    *      candidate volume ~ nprobe/nlist of the corpus;
    *   2. rescore: integer dots over int8 vectors (4× less bandwidth than
    *      float, SIMD-friendly layout) keep only `rescoreFactor × k` per
    *      query — this tier reads ONLY the quantized representation;
    *   3. re-rank: full-precision cosine touches just rescoreFactor×k×|Q|
    *      vectors — the only float reads after the scan.
    *
    * Recall floor vs [[bruteForceTopK]] asserted in DedupSpec (registered
    * as pq35, rows-only — approximate by design).
    */
  def ivfInt8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int,
      rescoreFactor: Int = 4): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe=$nprobe must be in [1, nlist=$nlist]")
    require(rescoreFactor >= 1, s"rescoreFactor=$rescoreFactor must be >= 1")
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist)
    val assigned = ivfAssign(corpus, idCol, vecCol, cents)
      .withColumnRenamed("id", "nbr_id")
    val wq = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cid").asc)
    val qprobes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("qv"), col("cvec")))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cid"))
    val cands = assigned.join(broadcast(qprobes), Seq("cid"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id")).distinct()
    // tier 2: int8 rescoring — integer dots, top rescoreFactor*k survive
    val cq = corpus.select(col(idCol).as("nbr_id"), quantizeInt8(col(vecCol)).as("nq"))
    val qq = broadcast(queries.select(col(idCol).as("query_id"), quantizeInt8(col(vecCol)).as("qq")))
    val survivors = cands.join(cq, "nbr_id").join(qq, "query_id")
      .withColumn("iscore", graft.functions.vector_dot_long(col("qq"), col("nq")))
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_by(col("iscore"), col("nbr_id"), k * rescoreFactor).as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("nbr_id"))
    // tier 3: exact re-rank of the survivors only
    val scored = survivors
      .join(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nv")), "nbr_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), "query_id")
      .withColumn("cos_r", round(cosine(col("qv"), col("nv")), 4))
    rankTopK(scored, "cos_r", k)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket(s) —
    * `tables` independent hyperplane families, the query side probing
    * `probes`-flip-adjacent buckets in each. Recall measured against
    * [[bruteForceTopK]] in DedupSpec; the union over tables is what lifts it
    * past what a single table can reach (1-(1-r)^L vs r).
    */
  /** The deduped (query_id, nbr_id) candidate pairs behind [[signLshTopK]] —
    * the pre-ranking candidate volume, exposed so tests can measure how much
    * of the nQ×corpus pair space the bucketing actually admits (DedupSpec
    * asserts on THIS count, not the k-truncated output, which is capped at
    * nQ×k regardless of how selective the buckets were).
    */
  def signLshCandidates(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      probes: Int,
      tables: Int): DataFrame = {
    val cb = lshTableBuckets(corpus, idCol, vecCol, planes, tables)
      .withColumnRenamed("id", "nbr_id")
    val qb = broadcast(
      lshTableProbes(queries, idCol, vecCol, planes, tables, probes)
        .withColumnRenamed("id", "query_id")
        .withColumnRenamed("tbl", "qtbl").withColumnRenamed("bucket", "qbucket"))
    // a neighbor can hit several probe buckets/tables of one query — dedupe
    // the candidate id pairs BEFORE scoring so each pair costs one dot and
    // row_number ranks unique neighbors
    cb.join(qb,
        col("qtbl") === col("tbl") && col("qbucket") === col("bucket") &&
          col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id")).distinct()
  }

  def signLshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int,
      probes: Int = 0,
      tables: Int = 1): DataFrame = {
    val cands = signLshCandidates(corpus, queries, idCol, vecCol, planes, probes, tables)
    val scored = cands
      .join(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nv")), "nbr_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), "query_id")
      .withColumn("cos_r", round(cosine(col("qv"), col("nv")), 4))
    rankTopK(scored, "cos_r", k)
  }

  /** Distributed Lloyd's k-means by cosine, `iters` update rounds from a
    * deterministic id-sampled seed set — the centroid trainer whose output
    * feeds [[graft.dedup.Dedup.semanticClusterDedup]] and [[ivfTopK]] in
    * production. Returns the final (vec_id, cluster) assignment.
    *
    * 100 TB shape (the one every distributed k-means converges on, e.g.
    * Spark MLlib's): centroids live on the DRIVER between iterations (k×d
    * doubles — the collect() here is that residency, not a data collect) and
    * enter each pass as literals, so assignment is a row-local argmax with
    * ZERO shuffle of the corpus; the update is a (cluster, dim) partial agg
    * whose exchange carries ≤ partitions×k×d fixed-width rows. Per-iteration
    * shuffled bytes are independent of corpus size.
    *
    * Engine-portable determinism: per-dimension means use the pq26
    * fixed-point contract (floor to 1e-6, INTEGER sums — partition order
    * cannot change the result; the mean is recovered by two IEEE divisions),
    * cosines are the bit-reproducible left-fold dot, and argmax ties break
    * to the smallest centroid id — so an oracle that unrolls the same
    * `iters` rounds in SQL reproduces every assignment exactly. Empty
    * clusters drop on both sides (the aggregate simply has no group).
    */
  def kmeansAssignByCosine(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      seedModulus: Long,
      iters: Int): DataFrame =
    kmeansAssignFull(df, idCol, vecCol, seedModulus, iters)
      .select(col("vec_id"), col("cluster"))

  /** [[kmeansAssignByCosine]] keeping the double-cast vector alongside the
    * assignment (`vec_id, v, cluster`) — for downstream stages that need
    * both (e.g. SemDeDup's in-cluster pruning) without re-joining the
    * corpus.
    */
  private[graft] def kmeansAssignFull(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      seedModulus: Long,
      iters: Int): DataFrame = {
    val dot = graft.functions.vector_dot _
    val pts = df.select(idCol.as("id"), transform(vecCol, _.cast("double")).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    var cents: Array[(Long, Seq[Double], Double)] =
      pts.filter(col("id") % seedModulus === 0)
        .select(col("id"), col("v"), col("nv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
        .sortBy(_._1)
    require(cents.nonEmpty,
      s"seedModulus=$seedModulus selected no seed ids — every vector would be " +
        "silently assigned a null cluster; pick a modulus that divides some id")

    // row-local argmax over the centroid literals: max struct by
    // (ccos, -cid) ⇔ ORDER BY ccos DESC, cid ASC. The whole centroid
    // matrix rides in ONE typedLit (k×d of DATA in a single Literal node,
    // iterated by a transform lambda) — an array(struct(lit...)...) of k
    // members would put k×d literal NODES in the expression tree and spend
    // multiple seconds in Janino per iteration once k reaches the hundreds
    def assigned(): DataFrame = {
      val centsLit = typedLit(cents.toSeq)
      val scoredC = transform(centsLit, c => struct(
        (dot(col("v"), c.getField("_2")) / (col("nv") * c.getField("_3"))).as("ccos"),
        (-c.getField("_1")).as("ncid"),
        c.getField("_1").as("cid")))
      pts.withColumn("cluster", array_max(scoredC).getField("cid"))
    }

    for (_ <- 1 to iters) {
      val upd = assigned()
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .select(col("cluster"), col("dim"),
          floor(col("x") * lit(1e6)).cast("long").as("xq"))
        .groupBy(col("cluster"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xq")).as("s"))
        .select(col("cluster"), col("dim"),
          (col("s").cast("double") / col("n") / lit(1e6)).as("c"))
        .groupBy(col("cluster"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("c")))),
          e => e.getField("c")).as("cv"))
        .withColumn("ncv", sqrt(dot(col("cv"), col("cv"))))
      cents = upd.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
        .sortBy(_._1)
    }
    assigned().select(col("id").as("vec_id"), col("v"), col("cluster"))
  }
}
