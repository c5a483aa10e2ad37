package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stream probe's latency histogram: fixed-width 0.1 ms buckets, the
  * bounded-memory percentile recorder behind `stream_latency_p*_ms`.
  * BenchMetrics is a JVM-wide singleton, so every test resets it and the
  * suite never runs concurrently with a Bench main (tests fork per-suite).
  */
class BenchMetricsSpec extends AnyFunSuite {

  private def ms(v: Double): Long = (v * 1e6).toLong // millis → nanos

  test("percentiles land in the recorded value's bucket (±0.05 ms midpoint error)") {
    BenchMetrics.reset()
    // 100 samples at 1..100 ms: pXX = XX ms exactly at bucket resolution
    (1 to 100).foreach(i => BenchMetrics.record(ms(i.toDouble)))
    assert(math.abs(BenchMetrics.percentileMs(0.50) - 50.0) <= 0.05)
    assert(math.abs(BenchMetrics.percentileMs(0.90) - 90.0) <= 0.05)
    assert(math.abs(BenchMetrics.percentileMs(0.99) - 99.0) <= 0.05)
    assert(math.abs(BenchMetrics.percentileMs(1.00) - 100.0) <= 0.05)
    // monotone in q
    val qs = Seq(0.1, 0.5, 0.9, 0.99, 0.999, 1.0).map(BenchMetrics.percentileMs)
    assert(qs == qs.sorted, s"percentiles must be monotone: $qs")
  }

  test("overflow bucket (≥500 ms) reports the observed max, not a clamp") {
    BenchMetrics.reset()
    (1 to 99).foreach(_ => BenchMetrics.record(ms(1.0)))
    BenchMetrics.record(ms(750.0)) // beyond the 500 ms histogram range
    assert(math.abs(BenchMetrics.percentileMs(0.50) - 1.05) <= 0.1)
    assert(BenchMetrics.percentileMs(1.0) == 750.0,
      "the overflow bucket must surface the true max")
  }

  test("reset clears counts and the histogram") {
    BenchMetrics.reset()
    BenchMetrics.record(ms(10.0))
    BenchMetrics.reset()
    assert(BenchMetrics.percentileMs(0.5) == 0.0, "no samples → 0")
    assert(BenchMetrics.latN.sum() == 0L && BenchMetrics.latMax.get() == 0L)
  }
}
