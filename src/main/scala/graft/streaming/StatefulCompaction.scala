package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A1 — compaction with explicit keyed state, the closest semantic mirror of
  * the reference's `CompactionProcessor` (`processors/CompactionProcessor.java:48-234`):
  * an in-flight window per key holds the current survivor; same-key arrivals
  * are compacted by a user `pick(left, right)` (the compactor returning
  * PICK_LEFT/RIGHT, :199-226); the survivor flushes when the window closes
  * (scheduled flush :149-155,179-182).
  *
  * Here the window closes on EVENT-time: the survivor is emitted when the
  * watermark passes `firstSeen + lingerMillis`. Unlike the reference's
  * in-memory map — lost on rebalance and rebuilt by replay — this state lives
  * in the checkpointed state store, so a crash mid-linger does not double-emit
  * or lose the survivor. State size: one V per active (key, window) — bounded
  * by linger × key-arrival rate, independent of input volume.
  *
  * The declarative window/max_by form ([[StreamOps.compactLatest]]) is the
  * right default — Catalyst plans it with partial aggregation. This typed
  * form exists for compactors that aren't max-by-a-column (arbitrary
  * `pick`), which the reference supports and no built-in aggregate expresses.
  */
object StatefulCompaction {

  def compactTyped[K, V](
      ds: Dataset[V],
      key: V => K,
      eventTimeMillis: V => Long,
      lingerMillis: Long,
      pick: (V, V) => V)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[V] = {

    implicit val stateEnc: Encoder[(V, Long)] = Encoders.tuple(vEnc, Encoders.scalaLong)

    ds.groupByKey(key)
      .flatMapGroupsWithState[(V, Long), V](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, values: Iterator[V], state: GroupState[(V, Long)]) =>
          if (state.hasTimedOut) {
            // window closed: flush the survivor downstream
            val (winner, _) = state.get
            state.remove()
            Iterator.single(winner)
          } else {
            val merged = values.foldLeft(state.getOption) {
              case (None, v) => Some((v, eventTimeMillis(v) + lingerMillis))
              case (Some((w, deadline)), v) => Some((pick(w, v), deadline))
            }
            merged.foreach { case (w, deadline) =>
              state.update((w, deadline))
              // clamp: Spark rejects a timeout at/behind the current
              // watermark (a later batch can advance the watermark past a
              // stored deadline before this key's timeout fires); the clamped
              // timer still fires on the very next watermark move
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(deadline, wm + 1))
            }
            Iterator.empty
          }
      }
  }
}
