package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchFloors
import graft.tools.BenchFloors.Window

/** The bench floor-regression gate ([[BenchFloors]]): committed warm mins
  * vs the median-of-windows floors with a per-query variance band — red on
  * a real plan regression (warm min moved past the band), green under box
  * noise AND under a query's own committed mode-to-mode variance (the r19
  * lesson: a single lucky window must not become a permanent tripwire).
  * No Spark session — the gate reads only the committed artifacts.
  */
class BenchFloorSpec extends AnyFunSuite {

  private val windowsPath = "tools/bench_floor_windows.json"

  test("gate catches an injected regression and passes matching mins") {
    val w1 = Window("w1", Map("q01" -> 0.5, "q02" -> 1.0, "q03" -> 0.2))
    val w2 = Window("w2", Map("q01" -> 0.55, "q02" -> 0.9, "q03" -> 0.21))
    // q01 regressed 3x (e.g. a forced non-broadcast join), q02 is noisy
    // but under 2x of its median (0.9), q04 is new (no history — skipped)
    val mins = Map("q01" -> 1.5, "q02" -> 1.7, "q04" -> 9.9)
    val v = BenchFloors.violations(mins, Seq(w1, w2), factor = 2.0)
    assert(v.map(_._1) == Seq("q01"), s"got $v")
    assert(BenchFloors.violations(w1.mins, Seq(w1, w2)).isEmpty,
      "a committed window never fires against its own history")
  }

  test("variance band: a bimodal query's slow mode passes, a 3x regression past it fires") {
    // pq99's actual r19 shape: fast window 0.33, slow window 1.18
    val hist = Seq(Window("fast", Map("q" -> 0.33)), Window("slow", Map("q" -> 1.18)))
    // floor = lower-middle median 0.33, spread = 1.18/0.33 = 3.58,
    // threshold = 0.33 * 1.5 * 3.58 = 1.77: the observed slow mode passes...
    assert(BenchFloors.violations(Map("q" -> 1.18), hist).isEmpty,
      "committed slow mode must not fire")
    // ...but 3x the slow mode is a real regression
    assert(BenchFloors.violations(Map("q" -> 3.6), hist).map(_._1) == Seq("q"))
    // a STABLE query keeps the plain 2x band — no free slack
    val stable = Seq(Window("a", Map("q" -> 0.50)), Window("b", Map("q" -> 0.52)))
    assert(BenchFloors.violations(Map("q" -> 1.1), stable).map(_._1) == Seq("q"),
      "2.2x a stable floor must still fire")
  }

  test("every committed window passes the gate built from the committed history") {
    val windows = BenchFloors.readWindows(windowsPath)
    assume(windows.nonEmpty, "window history absent")
    // in particular BOTH r19 windows — the committed fast one and the
    // driver's slow one — must be green against the same policy
    windows.foreach { w =>
      val v = BenchFloors.violations(w.mins, windows)
      assert(v.isEmpty,
        v.map { case (n, m, t) => f"$n: min $m%.3f vs threshold $t%.3f" }
          .mkString(s"window '${w.id}' fails its own history:\n", "\n", ""))
    }
  }

  test("committed BENCH_SELF warm mins stay within the variance-banded floors") {
    val self = "BENCH_SELF.json"
    // only a definitive sf0.1 artifact is comparable to the sf0.1 floors;
    // a small-SF loop artifact (or a missing file on a fresh clone) skips
    assume(BenchFloors.artifactSf(self).endsWith("sf0.1"),
      "BENCH_SELF.json is not an sf0.1 artifact in this tree")
    val mins = BenchFloors.readNumberMap(self, Some("queries_min"))
    val windows = BenchFloors.readWindows(windowsPath)
    assume(mins.nonEmpty && windows.nonEmpty, "artifacts absent")
    val v = BenchFloors.violations(mins, windows)
    assert(v.isEmpty,
      v.map { case (n, m, t) => f"$n: min $m%.3f vs threshold $t%.3f" }
        .mkString("plan regressions (warm min > variance-banded floor):\n", "\n", ""))
  }

  test("http_text decode throughput stays above the committed MB/s floor") {
    val self = "BENCH_SELF.json"
    assume(BenchFloors.artifactSf(self).endsWith("sf0.1"),
      "BENCH_SELF.json is not an sf0.1 artifact in this tree")
    val mbps = BenchFloors.readNumberMap(self, None).get("http_text_mbps")
    assume(mbps.nonEmpty, "artifact predates the embedded http probe")
    val floor = BenchFloors.readNumberMap("tools/http_floor.json", None)
      .getOrElse("mbps_floor", 0.0)
    assert(mbps.get >= floor,
      f"http_text decode ${mbps.get}%.0f MB/s fell under the ${floor}%.0f MB/s floor — " +
        "a decode-chain regression (r19's pq99 class) landed; see tools/http_floor.json")
  }

  test("window history round-trips through writeWindows/readWindows") {
    val ws = Seq(
      Window("a", Map("q01" -> 0.5, "q02" -> 1.25e-4)),
      Window("b", Map("q01" -> 0.75)))
    val tmp = java.nio.file.Files.createTempFile("floors", ".json")
    try {
      BenchFloors.writeWindows(tmp.toString, ws)
      val back = BenchFloors.readWindows(tmp.toString)
      assert(back.map(_.id) == Seq("a", "b"))
      assert(math.abs(back.head.mins("q02") - 1.25e-4) < 1e-12)
      assert(back(1).mins == Map("q01" -> 0.75))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("artifact readers tolerate missing files and malformed keys") {
    assert(BenchFloors.readNumberMap("/nonexistent/x.json", None).isEmpty)
    assert(BenchFloors.readNumberMap("BENCH_SELF.json", Some("no_such_key")).isEmpty)
    assert(BenchFloors.readWindows("/nonexistent/x.json").isEmpty)
    assert(BenchFloors.artifactSf("/nonexistent/x.json") == "")
  }
}
