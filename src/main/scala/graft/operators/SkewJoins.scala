package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for joins whose skew exceeds what AQE's skew-join
  * splitting handles (AQE splits oversized PARTITIONS after the shuffle; a
  * single key hot enough to dwarf a partition still lands on one reducer —
  * the classic power-law user_id/null-surrogate case at 100 TB).
  *
  * Shape: the skewed side gets a deterministic salt in [0, salts) derived
  * from a high-cardinality column (its row id), spreading one hot key over
  * `salts` reducers; the other side is replicated `salts` ways so every
  * (key, salt) cell still sees all its matches. Inner-join row multiset is
  * exactly the plain join's (each left row meets each matching right row in
  * precisely one salt cell); cost is `salts`× the smaller side's shuffle
  * volume — the deliberate trade against a single saturated reducer.
  */
object SkewJoins {

  /** Inner equi-join on `keys` with the LEFT side salted from `saltFrom`
    * (any column that varies within the hot key — a row id, an event
    * timestamp). `salts` of 8-64 covers most power-law skew; it multiplies
    * the right side's shuffle, so keep the smaller relation on the right.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFrom: Column,
      salts: Int): DataFrame = {
    require(keys.nonEmpty, "salted join needs at least one key column")
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val l = left.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** The DATA-DRIVEN half of skew handling: the report an operator reads
    * before committing a 100 TB shuffle key. Per top-`topK` hottest key:
    * its row count, corpus share in ppm (`⌊1e6·n/total⌋`), and the salt
    * factor that would level it — `⌈n·partitions/total⌉`, i.e. how many
    * reducers this key needs so its share of each is at most the average
    * partition load (1 = no salting needed; feed the max into
    * [[saltedJoin]]). All integer arithmetic, so the report is exact and
    * hash-checkable.
    *
    * Scale shape: ONE partial-agg shuffle on the key (counts combine
    * map-side — the hot key itself costs each mapper one counter, never a
    * sorted partition), the total rides a broadcast, and the top-K is a
    * TakeOrdered, not a global sort.
    */
  def keySkewReport(
      df: DataFrame,
      keyCol: Column,
      partitions: Int,
      topK: Int): DataFrame = {
    require(partitions >= 1 && topK >= 1, s"bad partitions=$partitions/topK=$topK")
    val counts = df.select(keyCol.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        floor(lit(1000000L) * col("n") / col("__total")).cast("long").as("share_ppm"),
        ceil(col("n") * lit(partitions.toLong) / col("__total")).cast("long").as("salt"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topK)
  }
}
