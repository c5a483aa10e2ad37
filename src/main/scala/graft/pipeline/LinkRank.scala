package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for frontier prioritization — the published
  * PageRank iteration (Page et al. 1999) over the crawl's outlink edges,
  * in INTEGER arithmetic so the result is bit-exact regardless of
  * partitioning: floating-point PageRank sums contributions in partition
  * order and no two runs (or engines) agree, while scaled-long floor
  * division makes every contribution an exact integer and `sum(long)`
  * order-independent — the same determinism rule the relational surface
  * uses (DECIMAL aggregation), applied to an iterative graph op.
  *
  * Semantics: ranks live in `scale` units (`scale` ≈ total probability
  * mass 1.0). Per iteration, every node keeps
  * `base = scale·(1−d)/n` plus `d·rank/outdeg` from each in-edge plus an
  * equal share of the dangling mass (nodes with no out-edges), all in
  * floor division — conservation is therefore within n integer
  * truncations of exact, and ordering (the thing a frontier consumes) is
  * unaffected.
  *
  * 100 TB shape: the edge list is pinned once (`localCheckpoint` — the
  * connected-components rule: an unpinned frame replans its whole
  * upstream per iteration); each iteration is ONE edges⋈ranks join
  * (co-partitioned on src across iterations), one partial-agg shuffle to
  * dst, one left join back to the node set; the dangling term is a
  * single scalar aggregate. Iterations are a fixed small count (rank
  * ordering stabilizes in ~10 even on web graphs — the published
  * convergence behavior), so the loop cost is `iterations ×` that budget.
  */
object LinkRank {

  /** `edges(src, dst)` → `(node, rank)` with `rank` in `scale` units.
    * Duplicate edges collapse first (a simple graph — host-graph edges
    * weight by existence, not multiplicity); self-loops count like any
    * other edge.
    */
  def integerPageRank(
      edges0: DataFrame,
      iterations: Int = 10,
      scale: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iterations >= 0, s"iterations=$iterations")
    require(dampNum > 0 && dampNum < dampDen, s"damping $dampNum/$dampDen out of range")
    val edges = edges0.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .dropDuplicates("src", "dst")
      .localCheckpoint()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // node set WITH its out-degree (null __deg = dangling): one pinned
    // frame replaces the r20-build round's separate nodes + danglingNodes
    // checkpoints, and the ranks frame inherits __deg so the per-iteration
    // dangling-mass term needs no join at all (r20 opt: the loop ran TWO
    // actions per iteration — a driver .head for the dangling scalar plus
    // the checkpoint — at ~0.3 s of fixed job cost each; now the dangling
    // mass is a 1-row aggregate broadcast INSIDE the iteration's single
    // job). Arithmetic is unchanged: sum/div on longs is the same integer
    // floor arithmetic whether the scalar lands on the driver or rides a
    // broadcast row, so ranks stay bit-exact (the pq106 oracle re-proves).
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.select(col("node"), lit(0L).as("rank"))
    // the per-edge denominator never changes — join it in once, pin it
    val edgesDeg = edges.join(outdeg, Seq("src")).localCheckpoint()
    val base = scale * (dampDen - dampNum) / (dampDen * n)
    var ranks = nodes.select(col("node"), col("__deg"), lit(scale / n).as("rank"))
    var it = 0
    while (it < iterations) {
      // dangling mass as a 1-row frame: nodes with no out-edges carry a
      // null __deg on the ranks frame itself
      val dangDf = ranks.where(col("__deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dm"))
      val contribs = edgesDeg
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(rank * ${dampNum}L) div (${dampDen}L * __deg)").as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__c"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangDf))
        .select(col("node"), col("__deg"),
          (lit(base) + expr(s"(__dm * ${dampNum}L) div (${dampDen}L * ${n}L)")
            + coalesce(col("__c"), lit(0L))).as("rank"))
      // truncate lineage every SECOND iteration (r21; was every iteration):
      // each eager localCheckpoint is a corpus-sized materialization job,
      // and the loop's cost at sf is almost entirely those per-iteration
      // fixed job costs. With ONE un-pinned level, iteration i+1's two
      // consumers of ranks_i (the dangling 1-row aggregate and the contribs
      // join) share ranks_i's exchanges via Spark's reused-exchange/stage
      // machinery instead of forcing a materialization, halving the job
      // count; deeper than one level the doubled-per-level plan tree starts
      // to cost more in planning than the saved job (the CC-rule blowup).
      // Arithmetic is untouched — integer floor ops are bit-exact however
      // the lineage is cut (pq106/pq108 oracles re-prove).
      ranks = if (it % 2 == 1 || it == iterations - 1) next.localCheckpoint() else next
      it += 1
    }
    ranks.select(col("node"), col("rank"))
  }
}
