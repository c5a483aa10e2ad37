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
}
