package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020): a
  * document is a BAG of vectors (token embeddings, video frames, passage
  * chunks) and relevance is MaxSim — for each query vector take the best
  * match in the document, then sum:
  * `score(q, d) = Σ_{i∈q} max_{j∈d} cos(q_i, d_j)`. This is the retrieval
  * tier between single-vector ANN (one embedding washes out detail) and
  * cross-encoders (too expensive to run over a corpus).
  *
  * Determinism contract: each per-query-vector max is frozen to
  * `floor(1e6·cos)` BEFORE the sum, so the score is an integer and
  * partition order cannot change it (the oracle replicates the same
  * left-fold cosine and the same freeze point).
  *
  * Scale shape: query frames broadcast; the corpus frame table is scanned
  * once; two partial-agg shuffles ((query, doc, qframe) max → (query, doc)
  * sum) and a bounded-heap top-k. The frame-pair space is |corpus frames| ×
  * |query frames| — at production scale pass `candidates` (e.g. the pq14
  * IVF result) to restrict scoring to ANN survivors, the PLAID refinement
  * pattern; the full cross form exists for exactness and the oracle.
  */
object LateInteraction {

  /** Top-`k` documents per query by MaxSim over frame/token vectors.
    * `frames`/`queryFrames`: (idCol, frameCol, vecCol) — one row per
    * vector. `candidates`: optional (query_id, nbr_id) pairs to restrict
    * scoring (ANN survivors); None scores the full cross.
    */
  def maxSimTopK(
      frames: DataFrame,
      queryFrames: DataFrame,
      idCol: String,
      frameCol: String,
      vecCol: String,
      k: Int,
      candidates: Option[DataFrame] = None): DataFrame = {
    val c = frames.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val q = broadcast(queryFrames.select(col(idCol).as("query_id"),
      col(frameCol).as("qf"), col(vecCol).as("qv")))
    val restricted = candidates match {
      case Some(cand) =>
        // candidate sets are ANN survivors (queries × k — kilobytes), so the
        // corpus-side SCAN shrinks first: only frames of candidate documents
        // reach the cross join at all (a semi join spanning both join sides
        // cannot be pushed below the join by Catalyst, so without this the
        // full |corpus frames| × |query frames| pair space materializes just
        // to be filtered). The pair-level semi join then enforces the exact
        // (query, doc) pairs — the PLAID refinement shape.
        val candPairs = cand.select(col("query_id"), col("nbr_id")).distinct()
        c.join(broadcast(candPairs.select(col("nbr_id")).distinct()),
            Seq("nbr_id"), "left_semi")
          .join(q, col("query_id") =!= col("nbr_id"))
          .join(broadcast(candPairs), Seq("query_id", "nbr_id"), "left_semi")
      case None => c.join(q, col("query_id") =!= col("nbr_id"))
    }
    val perQf = restricted
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .groupBy(col("query_id"), col("nbr_id"), col("qf"))
      .agg(max(col("cos")).as("m"))
    val scored = perQf
      .withColumn("m_fp", floor(col("m") * lit(1000000.0)).cast("long"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(sum(col("m_fp")).as("s"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_by(col("s").cast("double"), col("nbr_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("nbr_id"), col("e.score").cast("long").as("maxsim_fp"))
      .withColumn("maxsim", col("maxsim_fp").cast("double") / 1000000.0)
  }
}
