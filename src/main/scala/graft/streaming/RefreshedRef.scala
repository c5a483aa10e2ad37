package graft.streaming

/** Driver-side slow-cadence re-resolution — the dq25 trigger-boundary
  * re-broadcast pattern ([[StreamOps.termDriftAlarmRefreshed]], the
  * property registry's P4 reload rule) as a reusable handle: inside a
  * `foreachBatch` body, `at(batchId)` returns the provider's value,
  * re-resolved on the first call and then every `everyBatches`
  * micro-batches. The refreshed value enters THAT batch's plan as a new
  * local/broadcast relation, so a weeks-long stream picks up a grown PSL,
  * re-fetched robots rules, or an updated blocklist at the next refresh
  * trigger with no query restart — while the stateful operators upstream
  * keep their checkpoint.
  *
  * foreachBatch bodies run on the driver, so this is plain driver state
  * (the same `var cachedRef` the dq25 flow uses); a replayed batch id
  * re-resolves at worst one extra time — providers must be safe to call
  * repeatedly, which table loads are.
  */
final class RefreshedRef[A](provider: () => A, everyBatches: Int) {
  require(everyBatches >= 1, s"everyBatches=$everyBatches must be >= 1")
  private var cached: Option[A] = None

  def at(batchId: Long): A = {
    if (cached.isEmpty || batchId % everyBatches == 0) cached = Some(provider())
    cached.get
  }
}
