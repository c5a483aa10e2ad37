package graft.streaming

import org.apache.spark.sql.SparkSession

/** WHEN to fold self-index segments ([[StreamOps.compactIndexSegments]]):
  * the rent-or-buy scheduler the dq28/dq29 sinks were missing — segments
  * used to fold only on explicit demand, so an unattended stream grew one
  * directory per micro-batch forever.
  *
  * Cost model (both constants measured, not guessed — SELFIDX_PROBE's
  * per-batch curve gives the marginal probe cost of an extra segment, and
  * the fold is a scan+distinct+rewrite whose cost is linear in history
  * bytes):
  *   - RENT: every probe over a k-segment index pays ~`(k-1) ·
  *     perSegmentProbeSec` of fixed per-segment overhead (listing, footer
  *     reads, task scheduling) on top of the byte-linear scan the fold
  *     cannot reduce anyway.
  *   - BUY: folding a history of B MB costs ~`foldSecPerMb · B`.
  *
  * The classic ski-rental rule — compact when the accumulated rent since
  * the last fold reaches the current buy price — is 2-competitive against
  * any offline schedule (Karlin et al. 1988, public result): no adversarial
  * arrival pattern can make the scheduler pay more than twice the optimal
  * probe+fold total. [[shouldCompact]] is the pure decision (unit-testable
  * against the closed form); [[afterBatch]] wires it to a real index
  * directory and runs the fold.
  *
  * Scale posture: the decision reads only the segment LISTING (names +
  * sizes — driver metadata, no data scan), the fold itself is the
  * already-audited broadcast-free distinct. State is two doubles.
  */
final class SelfIndexCompaction(
    val perSegmentProbeSec: Double,
    val foldSecPerMb: Double,
    val minSegments: Int = 4) extends Serializable {

  require(perSegmentProbeSec > 0 && foldSecPerMb > 0 && minSegments >= 2,
    s"invalid cost model ($perSegmentProbeSec, $foldSecPerMb, $minSegments)")

  private var debtSec = 0.0
  private val fired = scala.collection.mutable.ArrayBuffer.empty[Long]

  /** Batches (durable ids) at which the policy fired — for audits/specs. */
  def firedAt: Seq[Long] = fired.toSeq

  /** Pure rent-or-buy decision for a k-segment, `totalMb` index, given the
    * rent already accumulated (`debtSec`, updated by the caller per
    * batch): buy once rent-to-date covers the fold.
    */
  def shouldCompact(k: Int, totalMb: Double, debtSec: Double): Boolean =
    k >= minSegments && debtSec >= foldSecPerMb * totalMb

  /** Accrue this batch's rent from the index's current segment listing and
    * fold `batch <= batchId - 1` when the rule fires (strictly below the
    * just-committed batch — the [[StreamOps.compactIndexSegments]] replay
    * contract: a replaying batch must never find its own rows in history).
    * Returns true iff a fold ran.
    */
  def afterBatch(spark: SparkSession, indexDir: String, batchId: Long): Boolean = {
    val p = java.nio.file.Paths.get(indexDir)
    if (!java.nio.file.Files.isDirectory(p)) return false
    import scala.jdk.CollectionConverters._
    val segs = scala.util.Using.resource(java.nio.file.Files.list(p)) { st =>
      st.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("batch="))
    }
    val k = segs.size
    val totalMb = segs.map { d =>
      scala.util.Using.resource(java.nio.file.Files.walk(d)) { st =>
        st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum
      }
    }.sum / 1048576.0
    debtSec += math.max(k - 1, 0) * perSegmentProbeSec
    if (shouldCompact(k, totalMb, debtSec)) {
      StreamOps.compactIndexSegments(spark, indexDir, batchId - 1)
      debtSec = 0.0
      fired += batchId
      true
    } else false
  }
}
