package graft.tools

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.plans.SpaceSaving

/** Micro-bench for SpaceSaving.update in the EVICTION regime (vocab far
  * beyond capacity — the zipf heavy-hitter workload, where most unseen
  * items evict). Round 4's buffer scanned all `capacity` counters per
  * eviction; the count-indexed buffer reads the min bucket directly. Pure
  * driver loop, no Spark: this isolates the per-update cost the sketch
  * pays inside every partial aggregate. Usage: runMain
  * graft.tools.SpaceSavingProbe [nItems] [capacity] [vocab]
  */
object SpaceSavingProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val capacity = args.lift(1).map(_.toInt).getOrElse(1024)
    val vocab = args.lift(2).map(_.toInt).getOrElse(200000)
    val rnd = new Random(42L)
    // zipf-ish ranks, pre-materialized so the timed loop is update-only
    val items: Array[UTF8String] = Array.fill(n) {
      val r = math.min(vocab - 1, (math.exp(rnd.nextDouble() * math.log(vocab)) - 1).toInt)
      UTF8String.fromString(s"t$r")
    }
    for (rep <- 1 to 3) {
      val buf = new SpaceSaving.Buf
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { SpaceSaving.update(buf, items(i), capacity); i += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: $n items, capacity $capacity, vocab $vocab -> " +
        f"${n / secs / 1e6}%.2f M updates/s (${secs}%.2f s), summary size ${buf.size}")
    }
  }
}
