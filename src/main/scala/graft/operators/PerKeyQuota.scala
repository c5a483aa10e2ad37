package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{cms_estimate, cms_merge, cms_sketch}
import graft.plans.CmsSketch

/** A3/A4 — per-key rate accounting and quota with traffic shaping
  * (`KeyCounter.java:39-152`, `WindowedKeyStat.java:31-111`,
  * `PerKeyQuotaManager.java:35-136`, `QuotaApplierImpl.java:56-114`).
  *
  * The reference estimates each key's rate with a 2-window ring of
  * conservative-update CMS sketches and diverts keys at or over quota to a
  * shaping topic. Two Spark forms:
  *
  *   - [[windowedRatesExact]]: exact per-(key, window) counts — a plain
  *     windowed groupBy. Fine when key cardinality per window fits a shuffle;
  *     this is the correctness oracle for the sketch path.
  *   - [[windowedSketch]] + [[estimateRates]]: one CMS sketch per window
  *     (constant memory per window regardless of key cardinality) and an
  *     estimate join — the 100 TB path, where the key space is unbounded and
  *     an exact count per key per window is itself a giant aggregation.
  */
object PerKeyQuota {

  /** Exact per-key counts per tumbling window of `windowDur` over `tsCol`. */
  def windowedRatesExact(df: DataFrame, keyCol: Column, tsCol: Column, windowDur: String): DataFrame =
    df.groupBy(window(tsCol, windowDur).as("win"), keyCol.as("key"))
      .agg(count(lit(1)).as("n"))

  /** One serialized CMS per tumbling window.
    *
    * Plain partial aggregation: every input partition builds its own sketch
    * per window it sees, and the exchange moves only those `width*depth*8`-byte
    * partials (64 KiB at dq09's 2048×4) — far cheaper than shuffling every row
    * to co-locate a window, and it keeps all cores busy (a repartition-by-
    * window funnels a whole day of data into ONE task). Per-partition cells
    * upper-bound per-partition counts, so the summed merge preserves the CMS
    * upper-bound guarantee (asserted in CmsSpec).
    */
  def windowedSketch(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      windowDur: String,
      width: Int = CmsSketch.DefaultWidth,
      depth: Int = CmsSketch.DefaultDepth,
      conservative: Boolean = true,
      portable: Boolean = false): DataFrame =
    df.withColumn("win", window(tsCol, windowDur))
      .groupBy(col("win"))
      .agg(cms_sketch(graft.functions.key_bytes(keyCol), width, depth, conservative, portable)
        .as("sketch"))

  /** Production-size sketches (the reference's quota budget is 65536×12 ≈
    * 6 MB — `PerKeyQuotaManager.java:36-51`): with hundreds of input
    * partitions, M×6 MB partials converging on one reducer per window is its
    * own hot spot. Two-level merge: salt each row into `salts` subgroups,
    * aggregate a sketch per (window, salt) — fan-in M/salts per first-level
    * reducer — then element-wise-merge the `salts` sketches per window.
    * Identical result to [[windowedSketch]] (merge is commutative +
    * associative), bounded fan-in at every step.
    */
  def windowedSketchSalted(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      windowDur: String,
      salts: Int,
      width: Int = CmsSketch.DefaultWidth,
      depth: Int = CmsSketch.DefaultDepth): DataFrame =
    df.withColumn("win", window(tsCol, windowDur))
      .withColumn("__salt", pmod(crc32(graft.functions.key_bytes(keyCol)), lit(salts)))
      .groupBy(col("win"), col("__salt"))
      .agg(cms_sketch(graft.functions.key_bytes(keyCol), width, depth).as("part"))
      .groupBy(col("win"))
      .agg(cms_merge(col("part")).as("sketch"))

  /** Backfill form of [[windowedSketchSalted]] for MANY windows at once:
    * co-locate rows by (window, salt) FIRST, then sketch. The partial-agg
    * forms emit one width×depth partial per (window, salt) per input
    * partition — right for a streaming trigger (one or two live windows:
    * salts×6 MB per partition ≪ the rows), but a 30-day batch backfill at
    * the production 65536×12 budget makes EVERY input partition emit
    * 30×salts×3 MB ≈ 360 MB of partials and hold 30×salts×6 MB of live
    * buffers — partial traffic and heap churn proportional to
    * windows×salts×sketchBytes×partitions, REGARDLESS of row count. This
    * form pays one narrow row shuffle (bounded by the event bytes) instead;
    * after the repartition the aggregation needs no further Exchange and
    * each task holds only its own few buffers. Crossover: prefer the
    * partial forms when bytes-per-partition ≫ windows×salts×sketchBytes,
    * this one otherwise (at sf0.1/local[32]/8g the two tie at ~3 s — the
    * partial flood still fits that heap; the win is the bounded memory
    * profile, which is what survives the 100× backfill). Same estimate
    * guarantee (per-key salt routing keeps each key's updates in one
    * conservative-update buffer; the summed cross-salt merge preserves the
    * CMS upper bound, asserted in CmsSpec).
    */
  def windowedSketchRepartitioned(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      windowDur: String,
      salts: Int,
      width: Int = CmsSketch.DefaultWidth,
      depth: Int = CmsSketch.DefaultDepth): DataFrame =
    df.withColumn("win", window(tsCol, windowDur))
      .withColumn("__salt", pmod(crc32(graft.functions.key_bytes(keyCol)), lit(salts)))
      .repartition(col("win"), col("__salt"))
      .groupBy(col("win"), col("__salt"))
      .agg(cms_sketch(graft.functions.key_bytes(keyCol), width, depth).as("part"))
      .groupBy(col("win"))
      .agg(cms_merge(col("part")).as("sketch"))

  /** Estimated count for each (key, window) pair in `keys` via the sketch
    * table (broadcast: one row per window). Right for POINT lookups; for a
    * large keyed row stream use [[estimatesPortableByCellJoin]] — this form
    * carries the full serialized sketch into every joined row, and the
    * estimate expression's per-row binary extraction copies the whole
    * width·depth buffer each time (measured: ~6.4 GB of copy for 100k rows
    * against a 64 KB sketch; 6 MB/row at the production 65536×12 budget).
    */
  def estimateRates(keys: DataFrame, sketches: DataFrame, keyCol: Column): DataFrame =
    keys.join(broadcast(sketches), keys("win") === sketches("win"))
      .select(keys("win"), keyCol, cms_estimate(col("sketch"), graft.functions.key_bytes(keyCol)).as("est"))

  /** Portable-slot expression for hash row `r` over `key_bytes(keyCol)` —
    * the COLUMN replica of [[graft.plans.CmsSketch.slotsPortable]] (block
    * ⌊r/5⌋ md5 over the uppercase hex of the key bytes, 15-hex-char window
    * at offset 4·(r mod 5), mod width), entirely codegen'd builtins.
    */
  private def portableSlot(keyCol: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"${r / 5}:"), hex(graft.functions.key_bytes(keyCol)))),
      1 + (r % 5) * 4, 15), 16, 10).cast("long") % width

  /** Per-key estimates for a LARGE keyed row stream without moving sketch
    * bytes through it: each window's sketch explodes ONCE into
    * `(win, cell-coordinate, value)` rows — windows × width·depth rows,
    * independent of key count — while each keyed row computes its `depth`
    * portable slot coordinates row-locally (codegen md5, the exact
    * [[graft.plans.CmsSketch.slotsPortable]] family) and min-joins on the
    * coordinate. Input `keyed` must carry `win` and `keyCol`; every other
    * column passes through (the grain must be unique per (win, key)).
    * Output: `keyed` + `est_n`. Only fixed-width coordinates shuffle; the
    * sketch binary never enters a per-key row.
    */
  def estimatesPortableByCellJoin(
      sketches: DataFrame,
      keyed: DataFrame,
      keyCol: Column,
      width: Int,
      depth: Int): DataFrame = {
    // case-INSENSITIVE checks: Spark resolves columns case-insensitively by
    // default, so an 'EST_N' column collides exactly like 'est_n' would
    Seq("keyed" -> keyed, "sketches" -> sketches).foreach { case (which, df) =>
      require(df.columns.exists(_.equalsIgnoreCase("win")),
        s"estimatesPortableByCellJoin joins on a 'win' column — $which lacks it " +
          s"($which has ${df.columns.mkString(", ")})")
    }
    val reserved = Set("__ci", "__w", "__v", "est_n")
    require(!keyed.columns.exists(c => reserved(c.toLowerCase)),
      "keyed must not carry the reserved columns __ci/__w/__v/est_n (any case)")
    val cells = sketches.select(col("win").as("__w"),
      posexplode(graft.functions.cms_cells(col("sketch"))).as(Seq("__ci", "__v")))
    val passCols = keyed.columns.map(col)
    val probes = keyed.select(passCols :+
      explode(array((0 until depth).map(r =>
        lit(r) * width + portableSlot(keyCol, r, width)): _*)).as("__ci"): _*)
    probes.join(cells, probes("win") === cells("__w") && probes("__ci") === cells("__ci"))
      .groupBy(passCols: _*)
      .agg(min(col("__v")).as("est_n"))
  }

  /** Keys whose exact windowed count reaches `quota` in any window — the
    * shaping decision set (`PerKeyQuotaManager.java:112-135` uses estimated
    * rate >= quota).
    */
  def violatingKeysExact(df: DataFrame, keyCol: Column, tsCol: Column, windowDur: String, quota: Long): DataFrame =
    windowedRatesExact(df, keyCol, tsCol, windowDur)
      .filter(col("n") >= quota)
      .select(col("key")).distinct()

  /** The `decaton.per.key.quota.processing.rate` binding
    * ([[graft.config.EngineProperties.PerKeyQuotaProcessingRate]]): None =
    * unlimited (-1, quota routing disabled — the reference only shapes when
    * `enablePerKeyQuota` is on AND the rate is set). Resolve per batch for
    * trigger-boundary hot reload, the property is Reloadable in the
    * reference too (`ProcessorProperties.java:199-210`).
    */
  def quotaFromProperties(props: graft.config.Properties): Option[Long] = {
    val v = props.resolve(graft.config.EngineProperties.PerKeyQuotaProcessingRate)
    if (v < 0L) None else Some(v)
  }

  /** S5 routing: split a batch into (compliant, shaped) by key membership in
    * `shapedKeys`. Both sides write in one foreachBatch pass in streaming.
    */
  def route(df: DataFrame, keyCol: Column, shapedKeys: DataFrame): (DataFrame, DataFrame) = {
    val shaped = broadcast(shapedKeys.toDF("__shaped_key").distinct())
    val toShape = df.join(shaped, keyCol === col("__shaped_key"), "left_semi")
    val ok = df.join(shaped, keyCol === col("__shaped_key"), "left_anti")
    (ok, toShape)
  }

  /** E4 — quota-callback failure policy: the user callback picks the shaping
    * topic per bursting key; if it throws, the task is completed WITHOUT
    * shaping (`QuotaApplierImpl.java:69-77`, documented
    * `PerKeyQuotaConfig.java:104-112`). The callback runs once per violating
    * key on the driver (the violator set is small by construction); a null /
    * failed decision sends the key's records down the process side.
    */
  def routeWithCallback(
      df: DataFrame,
      keyCol: Column,
      shapedKeys: DataFrame,
      chooseTopic: Any => String): (DataFrame, DataFrame) = {
    val decided = shapedKeys.toDF("__shaped_key").distinct().collect().flatMap { r =>
      val k = r.get(0)
      scala.util.Try(Option(chooseTopic(k))).toOption.flatten.map(t => (k, t))
    }
    if (decided.isEmpty)
      // schema-stable empty shaped side: downstream writers select
      // shaping_topic regardless of whether any callback succeeded this batch
      (df, df.limit(0).withColumn("shaping_topic", lit(null).cast("string")))
    else {
      val spark = df.sparkSession
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val keyType = df.select(keyCol).schema.head.dataType
      val decidedDf = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(decided.map(d => Row(d._1, d._2)): _*),
        StructType(Seq(StructField("__shaped_key", keyType), StructField("shaping_topic", StringType)))))
      val toShape = df.join(decidedDf, keyCol === col("__shaped_key")).drop("__shaped_key")
      val ok = df.join(decidedDf, keyCol === col("__shaped_key"), "left_anti")
      (ok, toShape)
    }
  }
}
