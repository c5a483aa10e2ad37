package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-table training (Sennrich et al. 2016): each round re-tokenizes
  * the corpus under the merges learned so far, counts adjacent subword
  * pairs, and adopts the most frequent pair (ties lexicographic, so
  * training is fully deterministic and partition-order-proof).
  *
  * 100 TB shape: one partial-agg pair-count shuffle per merge round — the
  * k-means-rounds cost model (pq39): the corpus is re-scanned, never
  * re-shuffled, and the driver keeps only the (pair, count) argmax. Real
  * vocabularies (30k merges) amortize by training on a sample; the merges
  * themselves are kilobytes of driver-resident vocabulary that ride the
  * encode expression.
  */
object Bpe {

  /** Learn `numMerges` merges from `textCol`. Stops early when no adjacent
    * pair occurs at least `minCount` times.
    */
  def trainMerges(
      df: DataFrame,
      textCol: Column,
      numMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be positive")
    var merges = Vector.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val words = df.select(explode(bpe_subwords(textCol, merges)).as("w"))
        .filter(size(col("w")) >= 2)
      val top = words
        .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(
            element_at(col("w"), i).as("a"),
            element_at(col("w"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) exhausted = true
      else {
        merges = merges :+ ((top(0).getString(0), top(0).getString(1)))
        round += 1
      }
    }
    merges
  }

  /** [[trainMerges]] over a deterministic hash-decided sample of the
    * corpus — the practical form for real vocabularies (30k merges × a
    * full-corpus pair-count shuffle each round is the wrong trade; BPE
    * merge ranks stabilize on a fraction of the data). The sample is
    * [[graft.sampling.Sampling.fixedCountByHash]]'s: reproducible,
    * partition-independent, and NESTED (a bigger budget's sample contains
    * the smaller's), so re-training with more data refines rather than
    * reshuffles the vocabulary.
    */
  def trainMergesSampled(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      numMerges: Int,
      sampleCount: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    val sampled = graft.sampling.Sampling.fixedCountByHash(
      df.select(idCol.as("__id"), textCol.as("__text")),
      col("__id"), lit("all"), sampleCount)
    trainMerges(sampled, col("__text"), numMerges, minCount)
  }

  /** Per-document subword statistics under a merge table:
    * `(id, n_words, n_bpe_tokens)` — the counts token budgets and packing
    * actually need. Row-local, zero shuffle.
    */
  def tokenStats(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      merges: Seq[(String, String)]): DataFrame =
    df.select(idCol.as("id"), bpe_subwords(textCol, merges).as("ws"))
      .select(col("id"),
        size(col("ws")).cast("long").as("n_words"),
        size(flatten(col("ws"))).cast("long").as("n_bpe_tokens"))
}
