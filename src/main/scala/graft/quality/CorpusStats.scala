package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-distribution health reports. A natural-language corpus follows
  * Zipf's law (freq ∝ rank^-α with α ≈ 1); a scrape that deviates hard —
  * α far from 1, or a flat head — is template/boilerplate-dominated or
  * machine-generated, and the slope is the single number reviewers watch
  * across snapshot versions.
  */
object CorpusStats {

  /** Least-squares Zipf fit over the top-`topN` terms: one row with the
    * fitted exponent `alpha` (−slope of ln(count) ~ ln(rank)), the
    * intercept, and the term count fitted.
    *
    * Determinism contract (driver hash gate): both lns are rounded to 6 dp
    * and every regression sum runs in exact DECIMAL — parallel summation
    * order cannot change a digit; the only double ops are the final
    * num/den divisions, written in the identical association order on the
    * DuckDB side.
    *
    * 100 TB shape: one token-count shuffle (partial-agg combinable), then
    * `orderBy.limit` plans as TakeOrderedAndProject — per-partition top-N
    * heaps, never a global sort; everything after operates on `topN` rows.
    */
  /** Term-distribution drift between two corpus slices (reference vs
    * current): KL divergence in both directions over the union vocabulary
    * with add-one smoothing — the number a production pipeline alarms on
    * when a crawler update or an upstream feed silently changes what's
    * coming in.
    *
    * Determinism contract: KL(P‖Q) decomposes as
    * `Σ (a_t+1)·l_t / (A+V) + ln((B+V)/(A+V))` with
    * `l_t = ln((a_t+1)/(b_t+1))` — the per-term logs are rounded to 6 dp
    * and summed against integer counts in exact DECIMAL, so the only
    * doubles are the final division and the one global log, written in the
    * identical association order on the oracle side. The reverse direction
    * reuses `-l_t` (round is sign-symmetric in both engines).
    *
    * 100 TB shape: two token-count shuffles + one full-outer merge on the
    * term — all partial-agg friendly, vocabulary-sized, never corpus-sized;
    * the result is a single row.
    */
  def termDriftKl(ref: DataFrame, cur: DataFrame, textCol: Column): DataFrame = {
    def counts(df: DataFrame, name: String) =
      df.select(explode(split(textCol, " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as(name))
    val j = counts(ref, "a").join(counts(cur, "b"), Seq("t"), "full_outer")
      .na.fill(0L, Seq("a", "b"))
    val dec6 = DecimalType(12, 6)
    val dec20 = DecimalType(20, 0)
    val l = round(log((col("a") + 1).cast("double") / (col("b") + 1).cast("double")), 6)
      .cast(dec6)
    val s = j.agg(
      count(lit(1)).as("n_terms"),
      sum(col("a")).as("na"), sum(col("b")).as("nb"),
      sum((col("a") + lit(1)).cast(dec20) * l).as("s_ab"),
      sum((col("b") + lit(1)).cast(dec20) * (lit(0).cast(dec6) - l)).as("s_ba"))
    val av = (col("na") + col("n_terms")).cast("double")
    val bv = (col("nb") + col("n_terms")).cast("double")
    s.select(
      col("n_terms"), col("na").as("n_ref_tokens"), col("nb").as("n_cur_tokens"),
      round(col("s_ab").cast("double") / av + log(bv / av), 6).as("kl_ref_cur"),
      round(col("s_ba").cast("double") / bv + log(av / bv), 6).as("kl_cur_ref"))
  }

  /** Per-group out-of-vocabulary rate against the corpus' own top-`topN`
    * vocabulary: the feed-health number that flags a source drifting into
    * unseen terms (spam, another language, encoding damage) before any
    * model sees it. `(group, n_tokens, n_oov, oov_ppm)` with
    * `oov_ppm = ⌊1e6·n_oov/n_tokens⌋` — integer-exact, hash-checkable.
    *
    * 100 TB shape: one global token-count shuffle (partial-agg) +
    * TakeOrdered for the vocabulary (topN rows, broadcast back), then one
    * per-group partial agg over the token scan with a row-local membership
    * probe — the corpus never shuffles by content.
    */
  def oovRate(
      df: DataFrame,
      groupCol: Column,
      textCol: Column,
      topN: Int): DataFrame = {
    require(topN >= 1, s"topN=$topN must be positive")
    val toks = df.select(groupCol.as("group"), explode(split(textCol, " ")).as("t"))
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc).limit(topN)
      .select(col("t"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        floor(lit(1000000L) * col("n_oov") / col("n_tokens")).cast("long"))
  }

  def zipfFit(df: DataFrame, textCol: Column, topN: Int): DataFrame = {
    require(topN >= 2, s"topN=$topN: need at least 2 ranks to fit a line")
    val counts = df.select(explode(split(textCol, " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("t").asc).limit(topN)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("t").asc)))
    val dec6 = DecimalType(12, 6)
    val v = ranked.select(
      round(log(col("rank").cast("double")), 6).cast(dec6).as("x"),
      round(log(col("c").cast("double")), 6).cast(dec6).as("y"))
    val s = v.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
      sum(col("x") * col("y")).as("sxy0"),
      sum(col("x") * col("x")).as("sxx0"))
    // re-narrow the aggregate types so every product below stays within
    // DECIMAL(38) EXACTLY (Spark would otherwise widen past 38 and round;
    // the casts are lossless: |ln| <= 16 bounds every sum well inside these
    // widths for any topN <= 9999)
    val nD  = col("n").cast(DecimalType(4, 0))
    val sx  = col("sx0").cast(DecimalType(14, 6))
    val sy  = col("sy0").cast(DecimalType(14, 6))
    val sxy = col("sxy0").cast(DecimalType(20, 12))
    val sxx = col("sxx0").cast(DecimalType(20, 12))
    val num = (nD * sxy - sx * sy).cast("double")
    val den = (nD * sxx - sx * sx).cast("double")
    val slope = num / den
    s.select(
      col("n").as("n_terms"),
      round(-slope, 6).as("alpha"),
      round((sy.cast("double") - slope * sx.cast("double"))
        / col("n").cast("double"), 6).as("intercept"))
  }

  /** HyperLogLog register sketch (Flajolet et al. 2007) per group — the
    * mergeable distinct-count summary this family was missing: SpaceSaving
    * answers "which keys are hot", CMS answers "how hot is this key", HLL
    * answers "how many DISTINCT keys" in `m` bytes per group instead of a
    * corpus-wide exact-distinct shuffle.
    *
    * Layout over the 60-bit [[graft.functions.TextFunctions.portable_hash]]
    * (md5-prefix — engine-portable, so a DuckDB oracle can replay every
    * register): low `log2(m)` bits pick the register `j`, the remaining
    * `w = 60 - log2(m)` bits feed `rho = (w+1) - bitlen` — the 1-based
    * position of the leftmost 1-bit, `w+1` when the suffix is all zeros.
    * Register value `M_j = max(rho)`; empty registers are ABSENT here (the
    * sparse form — merge = unionByName + re-max) and densified to 0 by
    * [[hllDistinct]].
    *
    * 100 TB shape: one shuffle of (group, j, rho) with partial max — the
    * reduce side sees at most `groups × m` rows no matter the corpus size.
    */
  def hllRegisters(
      df: DataFrame,
      groupCol: Column,
      keyCol: Column,
      m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0 && m <= 65536,
      s"m=$m: register count must be a power of two in [16, 65536]")
    val bits = java.lang.Integer.numberOfTrailingZeros(m)
    val width = 60 - bits
    val h = graft.functions.TextFunctions.portable_hash(keyCol)
    df.select(
        groupCol.as("group"),
        h.bitwiseAND(lit((m - 1).toLong)).as("j"),
        shiftrightunsigned(h, bits).as("w"))
      .filter(col("j").isNotNull) // null keys carry no distinct-count signal
      .select(col("group"), col("j"),
        when(col("w") === 0L, lit(width + 1))
          .otherwise(lit(width + 1) - length(bin(col("w")))).as("rho"))
      .groupBy(col("group"), col("j"))
      .agg(max(col("rho")).cast("int").as("m_j"))
  }

  /** Distinct-count estimate per group from the [[hllRegisters]] sketch.
    *
    * Output per group: `zero_regs` (empty-register count V — feeds the
    * standard small-range linear-counting correction `m·ln(m/V)` downstream;
    * not applied here because `ln` is libm-dependent and this column must
    * hash identically across engines), `harmonic` (the EXACT integer
    * `2^(width+1) · Σ_j 2^-M_j` — every term is a dyadic power so the sum
    * carries no float error and no summation-order dependence), and `est`
    * (the raw HLL estimate `floor(α_m · m² / Σ 2^-M_j)` — α and the scale
    * constant are literal doubles and the only division is double/int64,
    * IEEE-identical across engines).
    *
    * 100 TB shape: the register shuffle above plus a groups×m densify
    * against the distinct group list — both bounded by group cardinality,
    * never by row count; this is the sketch path that replaces
    * `count(DISTINCT key)`'s full-key shuffle.
    */
  def hllDistinct(
      df: DataFrame,
      groupCol: Column,
      keyCol: Column,
      m: Int = 256): DataFrame = {
    val bits = java.lang.Integer.numberOfTrailingZeros(m)
    val width = 60 - bits
    val regs = hllRegisters(df, groupCol, keyCol, m)
    // Empty registers contribute a CLOSED FORM 2^(width+1) each, so the dense
    // groups×m densify (and its second scan of df for the group list) is
    // unnecessary: one aggregation over the sparse registers suffices. The
    // pq81 oracle SQL keeps its explicit densify CTE — the outputs are
    // provably identical for every group with at least one non-null key
    // (harmonic = Σ_pop 2^(w+1-M_j) + (m - populated)·2^(w+1)); a group with
    // ONLY null keys has no sketch and no output row.
    // alpha_m per Flajolet et al. §4: tabulated below m=128, asymptotic above.
    val alphaM: Double = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m.toDouble)
    }
    // constant arithmetic is associated EXACTLY like the oracle SQL so the
    // double matches bit-for-bit
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val alphaCol = if (m >= 128) alpha else lit(alphaM)
    val scale = lit(m.toDouble * m.toDouble) * lit(math.pow(2.0, (width + 1).toDouble))
    val emptyTerm = 1L << (width + 1)
    regs.groupBy(col("group"))
      .agg(
        count(lit(1)).as("populated"),
        // shiftleft(Column, Int) only takes a literal shift — the SQL form
        // accepts a column shift (base is BIGINT so the result stays long)
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${width + 1} - m_j)")).as("hpop"))
      .select(
        col("group"),
        (lit(m.toLong) - col("populated")).cast("int").as("zero_regs"),
        (col("hpop") + (lit(m.toLong) - col("populated")) * lit(emptyTerm))
          .as("harmonic"))
      .select(
        col("group"),
        col("zero_regs"),
        col("harmonic"),
        floor(alphaCol * scale / col("harmonic")).cast("long").as("est"))
  }

  /** KMV ("k minimum values") sketch per group: the `k` smallest DISTINCT
    * portable hashes of `keyCol`, ascending. Unlike HLL this sketch supports
    * SET OPERATIONS — the k smallest of a union of sketches is the sketch of
    * the union, so cross-group overlap/Jaccard runs on k values per group
    * instead of the exact distinct-key join ([[kmvJaccard]]).
    *
    * 100 TB shape: [[graft.plans.BottomKDistinctAgg]] keeps O(k) per
    * partition and merges map-side — the exchange carries at most
    * partitions×groups×k longs, never the corpus.
    */
  def kmvSketch(
      df: DataFrame,
      groupCol: Column,
      keyCol: Column,
      k: Int = 128): DataFrame =
    df.select(groupCol.as("group"),
        graft.functions.TextFunctions.portable_hash(keyCol).as("h"))
      .groupBy(col("group"))
      .agg(graft.functions.bottom_k_distinct(col("h"), k).as("kmv"))
      // the build k travels WITH the sketch: set operations over sketches
      // built with a different k are invalid (a union truncated above a
      // smaller sketch's threshold counts unknowable members as not-shared)
      .withColumn("k", lit(k))

  /** Pairwise Jaccard estimate between group sketches (Beyer et al. 2007):
    * for each group pair a < b, take the `k` smallest distinct hashes of the
    * UNION of the two sketches (itself a valid KMV sketch of the union) and
    * count how many live in BOTH — `inter_k / union_k` is an unbiased
    * Jaccard estimate. All-integer output (`jacc_pm` = per-mille floor), so
    * the whole path replays exactly in a SQL oracle.
    *
    * 100 TB shape: after the sketch aggregate the problem is
    * groups² × k longs — group cardinality is bounded (sources, shards,
    * snapshots), so the pair join is a broadcast of kilobytes regardless of
    * corpus size; the corpus-sized work is ONLY the one sketch shuffle.
    */
  def kmvJaccard(sketches: DataFrame): DataFrame = {
    val a = sketches.select(col("group").as("src_a"), col("kmv").as("ka"),
      col("k").as("k_a"))
    val b = sketches.select(col("group").as("src_b"), col("kmv").as("kb"),
      col("k").as("k_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      // truncating the union above a smaller sketch's threshold would count
      // unknowable members as not-shared — refuse mixed-k sketches outright
      .withColumn("k", when(col("k_a") === col("k_b"), col("k_a"))
        .otherwise(raise_error(concat(lit("kmvJaccard: sketches built with "
          + "different k cannot be combined: "), col("k_a").cast("string"),
          lit(" vs "), col("k_b").cast("string")))))
      .withColumn("u", expr("slice(array_sort(array_union(ka, kb)), 1, k)"))
      .select(
        col("src_a"), col("src_b"),
        size(col("u")).as("union_k"),
        size(array_intersect(array_intersect(col("u"), col("ka")), col("kb")))
          .as("inter_k"))
      // greatest(..,1): a group whose keys are all null has an EMPTY sketch
      // (union_k = 0 against any partner); report 0 shared, not NaN
      .withColumn("jacc_pm",
        floor(lit(1000.0) * col("inter_k") / greatest(col("union_k"), lit(1)))
          .cast("long"))
  }
}
