package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchFloors

/** The bench floor-regression gate ([[BenchFloors]]): committed warm mins
  * vs committed floors — red on a real plan regression (warm min moved),
  * green under box noise (medians move, mins don't). No Spark session —
  * the gate reads only the committed artifacts.
  */
class BenchFloorSpec extends AnyFunSuite {

  test("gate catches an injected regression and passes matching mins") {
    val floors = Map("q01" -> 0.5, "q02" -> 1.0, "q03" -> 0.2)
    // q01 regressed 3x (e.g. a forced non-broadcast join), q02 is noisy
    // but under 2x, q04 is new (no floor — skipped)
    val mins = Map("q01" -> 1.5, "q02" -> 1.9, "q04" -> 9.9)
    val v = BenchFloors.violations(mins, floors, factor = 2.0)
    assert(v == Seq(("q01", 1.5, 0.5)), s"got $v")
    assert(BenchFloors.violations(floors, floors).isEmpty, "identical mins never fire")
  }

  test("committed BENCH_SELF warm mins stay within 2x of the committed floors") {
    val self = "BENCH_SELF.json"
    // only a definitive sf0.1 artifact is comparable to the sf0.1 floors;
    // a small-SF loop artifact (or a missing file on a fresh clone) skips
    assume(BenchFloors.artifactSf(self).endsWith("sf0.1"),
      "BENCH_SELF.json is not an sf0.1 artifact in this tree")
    val mins = BenchFloors.readNumberMap(self, Some("queries_min"))
    val floors = BenchFloors.readNumberMap("tools/bench_floors.json", None)
    assume(mins.nonEmpty && floors.nonEmpty, "artifacts absent")
    val v = BenchFloors.violations(mins, floors, factor = 2.0)
    assert(v.isEmpty,
      v.map { case (n, m, f) => f"$n: min $m%.3f vs floor $f%.3f" }
        .mkString("plan regressions (warm min > 2x committed floor):\n", "\n", ""))
  }

  test("artifact readers tolerate missing files and malformed keys") {
    assert(BenchFloors.readNumberMap("/nonexistent/x.json", None).isEmpty)
    assert(BenchFloors.readNumberMap("BENCH_SELF.json", Some("no_such_key")).isEmpty)
    assert(BenchFloors.artifactSf("/nonexistent/x.json") == "")
  }
}
