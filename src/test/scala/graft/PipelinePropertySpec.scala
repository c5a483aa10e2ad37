package graft

import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.sampling.Sampling

/** Randomized cross-checks for the round-4 pipeline operators: each Spark
  * operator is compared against an independent in-memory Scala
  * implementation on seeded random corpora (same style as BrokerLogSpec's
  * randomized round-trip). The DuckDB oracle already pins these at sf0.01;
  * these runs cover shapes the synthetic corpus doesn't produce — empty
  * docs, single tokens, heavy repeats, every-doc-identical.
  */
class PipelinePropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  /** Random corpus over a tiny vocabulary (forces shared windows/tokens). */
  private def randomCorpus(nDocs: Int, vocab: Int, maxLen: Int): Seq[(Long, String)] =
    (1L to nDocs.toLong).map { id =>
      val len = rnd.nextInt(maxLen + 1) // 0 ⇒ empty text
      id -> Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" ")
    }

  private def toks(text: String): Vector[String] = text.split(" ", -1).toVector

  // --- duplicatedSpanStats vs brute force ----------------------------------

  private def bruteSpans(corpus: Seq[(Long, String)], n: Int): Map[Long, (Long, Long)] = {
    def grams(text: String): Vector[String] = {
      val t = toks(text)
      (0 to math.max(t.size - n, 0)).map(i => t.slice(i, i + n).mkString(" ")).toVector
    }
    val byDoc = corpus.map { case (id, tx) => id -> grams(tx) }
    val df = byDoc.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    byDoc.map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(g => df(g) > 1).toLong)
    }.toMap
  }

  test("duplicatedSpanStats matches brute force on random tiny-vocab corpora") {
    for (round <- 1 to 3) {
      val corpus = randomCorpus(nDocs = 40, vocab = 4, maxLen = 12)
      val got = Dedup.duplicatedSpanStats(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), n = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === bruteSpans(corpus, 3), s"round $round")
    }
  }

  test("duplicatedSpanStats: identical docs are 100% duplicated spans") {
    val corpus = (1L to 5L).map(_ -> "a b c d e f g")
    val out = Dedup.duplicatedSpanStats(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), n = 4)
      .collect()
    assert(out.length == 5 && out.forall(r => r.getLong(1) == 4L && r.getLong(2) == 4L))
  }

  // --- stratifiedByHash vs local md5 ---------------------------------------

  private def localBucket(id: Long): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000
  }

  test("stratifiedByHash selection equals the local md5-threshold computation") {
    val rows = (1L to 500L).map(id => (id, s"s${id % 7}"))
    val rates = Map("s0" -> 0, "s1" -> 1000, "s2" -> 333, "s3" -> 999)
    val got = Sampling.stratifiedByHash(
        rows.toDF("doc_id", "stratum"), col("doc_id"), col("stratum"),
        rates, defaultPerMille = 500)
      .select("doc_id").as[Long].collect().toSet
    val expect = rows.filter { case (id, s) =>
      localBucket(id) < rates.getOrElse(s, 500)
    }.map(_._1).toSet
    assert(got === expect)
    assert(!got.exists(_ % 7 == 0), "rate-0 stratum must be empty")
    assert((1L to 500L).filter(_ % 7 == 1).forall(got), "rate-1000 stratum keeps all")
  }

  // --- topTerms vs brute force ---------------------------------------------

  private def bruteTopTerms(corpus: Seq[(Long, String)], k: Int): Set[(Long, Int, String, Long, Long)] = {
    val tf = corpus.flatMap { case (id, tx) => toks(tx).map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), xs) => (id, t, xs.size.toLong) }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    tf.groupBy(_._1).flatMap { case (id, terms) =>
      terms.toSeq
        .map { case (_, t, c) => (t, c, df(t)) }
        .sortBy { case (t, c, d) => (-c, d, t) }
        .take(k).zipWithIndex
        .map { case ((t, c, d), i) => (id, i + 1, t, c, d) }
    }.toSet
  }

  test("topTerms matches brute force on random corpora") {
    for (round <- 1 to 3) {
      val corpus = randomCorpus(nDocs = 30, vocab = 6, maxLen = 15)
      val got = TextFunctions.topTerms(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), k = 3)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got === bruteTopTerms(corpus, 3), s"round $round")
    }
  }

  // --- chunkByTokens reconstruction ----------------------------------------

  test("chunks reconstruct the document exactly (overlap stripped) for random sizes") {
    for (_ <- 1 to 3) {
      val chunkSize = 2 + rnd.nextInt(6)
      val overlap = rnd.nextInt(chunkSize)
      val corpus = randomCorpus(nDocs = 25, vocab = 50, maxLen = 40)
      val chunks = TextFunctions.chunkByTokens(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), chunkSize, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
      corpus.foreach { case (id, text) =>
        val cs = chunks(id)
        val rebuilt = (cs.head.split(" ", -1).toVector +:
          cs.tail.map(_.split(" ", -1).toVector.drop(overlap))).flatten
        assert(rebuilt === toks(text), s"doc $id failed to reconstruct")
        // no chunk exceeds chunkSize; the first is full whenever the doc is
        val lens = cs.map(_.split(" ", -1).length)
        assert(lens.forall(_ <= chunkSize))
        assert(lens.head == math.min(chunkSize, toks(text).size))
      }
    }
  }

  // --- connectedComponents vs brute-force union-find -----------------------

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("connectedComponents matches union-find on random graphs (incl. long chains)") {
    for (round <- 1 to 4) {
      // sparse random graph: mostly small clusters, some larger merges
      val n = 60 + rnd.nextInt(40)
      val random = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      // plus one deliberate 200-node path: diameter far beyond the round
      // budget for plain HashMin — only pointer jumping converges in time
      val chainBase = 1000L
      val chainLen = 200L
      val chain = (0L until chainLen - 1).map(i => (chainBase + i, chainBase + i + 1))
      val edges = (random ++ chain).distinct
      // threshold -1 forces the distributed jump loop; MaxValue the driver
      // union-find fast path — both must produce identical labelings
      for (threshold <- Seq(-1L, Long.MaxValue)) {
        val got = Dedup.connectedComponents(
            edges.toDF("id_a", "id_b"), collectThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === bruteComponents(edges), s"round $round threshold $threshold")
        // the chain collapsed to its minimum label
        assert((0L until chainLen).forall(i => got(chainBase + i) == chainBase),
          s"round $round threshold $threshold chain")
      }
    }
  }

  test("minhash-verify agreement equals the long-form signature intersection") {
    // two near-identical docs (one token edited) plus unrelated ones: the
    // near-pair must survive verification, unrelated pairs must score low
    val base = Seq.fill(40)(s"w${rnd.nextInt(30)}").mkString(" ")
    val docs = Seq(
      1L -> base,
      2L -> (base.split(" ").init.mkString(" ") + " zz"),
      3L -> Seq.fill(40)(s"v${rnd.nextInt(30)}").mkString(" "))
    val sigs = Dedup.minHashSignaturesWide(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), k = 16, shingleSize = 5)
    val wide = sigs.collect().map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1))).toMap
    val agree12 = (0 until 16).count(i => wide(1L)(i) == wide(2L)(i))
    val agree13 = (0 until 16).count(i => wide(1L)(i) == wide(3L)(i))
    assert(agree12 * 2 >= 16, s"near-pair agreement $agree12/16 should pass the 1/2 gate")
    assert(agree13 * 2 < 16, s"unrelated agreement $agree13/16 should fail the 1/2 gate")
  }

  test("sequence packing matches an in-memory prefix-sum on random strata") {
    for (round <- 1 to 3) {
      val budget = 8 + rnd.nextInt(40)
      // idsPerRange forced tiny (including 1 = every doc its own range) so the
      // two-phase prefix sum crosses many range boundaries even at test scale
      val idsPerRange = Seq(1L, 7L, 4096L)(round - 1)
      val corpus = randomCorpus(nDocs = 60, vocab = 30, maxLen = 25)
        .map { case (id, tx) => (id, tx, s"s${rnd.nextInt(4)}") }
      val got = TextFunctions.packSequences(
          corpus.toDF("doc_id", "text", "lang"),
          col("doc_id"), col("text"), col("lang"), budget, idsPerRange)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      corpus.groupBy(_._3).foreach { case (_, docs) =>
        var offset = 0L
        docs.sortBy(_._1).foreach { case (id, tx, _) =>
          val n = tx.split(" ", -1).length.toLong // token_count counts empties like split(' ')
          assert(got(id) === ((n, offset, offset / budget)), s"round $round doc $id")
          offset += n
        }
      }
    }
  }

  test("sequence packing distributes: the data window keys on (stratum, range), not stratum") {
    val df = randomCorpus(nDocs = 40, vocab = 10, maxLen = 10)
      .map { case (id, tx) => (id, tx, s"s${id % 3}") }
      .toDF("doc_id", "text", "lang")
    val plan = TextFunctions.packSequences(
        df, col("doc_id"), col("text"), col("lang"), 64, idsPerRange = 8L)
      .queryExecution.executedPlan.toString
    val dataWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && l.contains("n_tokens")).toSeq
    assert(dataWindows.nonEmpty, "expected a running-sum window over the data")
    assert(dataWindows.forall(_.contains("__rng")),
      s"data window must partition by (stratum, __rng), got:\n${dataWindows.mkString("\n")}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "range base offsets must broadcast back, not shuffle the corpus")
  }

  test("canonical dedup groups case/punct/whitespace variants together") {
    val docs = Seq(
      1L -> "Hello, World!",
      2L -> "hello   world",
      3L -> "HELLO WORLD",
      4L -> "hello worlds", // different canonical form
      5L -> "  hello!! world  ")
    val got = Dedup.exactByCanonicalContent(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 4L, 4L -> 1L)) // keep_id -> n_copies
  }

  test("fixed-count sampling is exact, hash-ordered, and nested across budgets") {
    import graft.sampling.Sampling
    val corpus = (1L to 120L).map(id => (id, s"s${id % 5}"))
    val df = corpus.toDF("doc_id", "lang")
    def sample(n: Int): Map[String, Seq[Long]] = Sampling
      .fixedCountByHash(df, col("doc_id"), col("lang"), n)
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val s5 = sample(5)
    val s10 = sample(10)
    // the bucketed two-level prune is selection-invariant in the bucket
    // count — 1 (degenerate single bucket) through many must all agree
    for (buckets <- Seq(1, 3, 17)) {
      val bucketed = Sampling.fixedCountByHash(df, col("doc_id"), col("lang"), 5, buckets)
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      assert(bucketed === s5, s"pruneBuckets=$buckets changed the selection")
    }
    val byHash = corpus.groupBy(_._2).view.mapValues(_.map(_._1).sortBy(id =>
      (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).substring(0, 15), 16), id))).toMap
    byHash.foreach { case (stratum, ordered) =>
      assert(s5(stratum) === ordered.take(5).sorted, s"stratum $stratum budget-5")
      assert(s10(stratum) === ordered.take(10).sorted, s"stratum $stratum budget-10")
      assert(s5(stratum).toSet.subsetOf(s10(stratum).toSet), s"stratum $stratum not nested")
    }
  }

  test("fixed-count sampling distributes: ranking pre-prunes in hash buckets, corpus never shuffles") {
    import graft.sampling.Sampling
    // parquet-backed input: over a LocalRelation the optimizer eagerly
    // evaluates the hash+pmod projection and hides the plan shape under test
    val df = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val qe = Sampling.fixedCountByHash(df, col("doc_id"), col("lang"), 10, pruneBuckets = 8)
      .queryExecution
    val plan = qe.executedPlan.toString
    // level-1 window must key on (hash mod buckets, stratum) — the
    // well-distributed prune — before any per-stratum-only ranking (the
    // physical plan projects pmod into an alias, so check the logical plan)
    val windows = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(windows.size >= 2, s"expected two ranking levels, got:\n${windows.mkString("\n")}")
    assert(qe.optimizedPlan.toString.contains("pmod"),
      "level-1 ranking must partition by pmod(hash, buckets)")
    // the kept ids come back as a broadcast semi join — full-width rows never shuffle
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "keep-set must broadcast-semi-join onto the corpus")
  }

  test("int8 quantization (array form) matches the per-element scalar formula") {
    val vecs = Seq.tabulate(25)(i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 4f))) :+ (99L, Array.fill(8)(0f))
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), posexplode(graft.similarity.Knn.quantizeInt8(col("embedding"))))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    vecs.foreach { case (id, v) =>
      val am = v.map(math.abs).max
      v.zipWithIndex.foreach { case (x, dim) =>
        val expected =
          if (am == 0f) 0L
          else math.floor(x.toDouble / am.toDouble * 127.0).toLong
        assert(got((id, dim)) === expected, s"vec $id dim $dim")
      }
    }
    // end-points: the max-magnitude component quantizes to ±127 (or -128 never)
    vecs.filter(_._2.exists(_ != 0f)).foreach { case (id, v) =>
      val am = v.map(math.abs).max
      val qs = v.indices.map(d => got((id, d)))
      assert(qs.contains(127L) || v.forall(x => x != am), s"vec $id missing +127 endpoint")
      assert(qs.forall(q => q >= -128L && q <= 127L), s"vec $id out of int8 range")
    }
  }

  test("fixed-point label centroids match an in-memory computation") {
    val vecs = Seq.tabulate(30) { i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f), i % 3)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = df
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        floor(col("x").cast("double") * lit(1e6)).cast("long").as("xq"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("xq")).as("s"))
      .select(col("label"), col("dim"),
        (col("s").cast("double") / col("n") / lit(1e6)).as("centroid"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (lbl <- 0 to 2; dim <- 0 until 8) {
      val members = vecs.filter(_._3 == lbl)
      val expected = members.map(v => math.floor(v._2(dim).toDouble * 1e6).toLong).sum
        .toDouble / members.size / 1e6
      assert(got((lbl, dim)) === expected, s"label $lbl dim $dim")
    }
  }
}
