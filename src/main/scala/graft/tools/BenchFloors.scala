package graft.tools

/** The bench floor-regression gate (round-19): `BENCH_SELF.json` carries
  * each query's warm-min (`queries_min` — the floor a plan can hit on this
  * box) beside the median; `tools/bench_floors.json` pins the committed
  * floors. A query whose NEW warm min exceeds its committed floor by more
  * than `factor` has a plan regression — a warm MIN is (near-)noise-free,
  * so a real regression cannot hide in box noise, and a noisy box cannot
  * fail the gate (noise moves medians, not mins; the factor-2 margin
  * absorbs what little it moves mins). BenchFloorSpec runs [[violations]]
  * over the committed artifacts and fails red on any breach; floors
  * re-pin whenever a round's definitive sf0.1 bench lands.
  */
object BenchFloors {

  /** Queries whose warm min exceeds `factor ×` their committed floor:
    * (name, min, floor). Queries absent from either side are skipped
    * (new queries have no floor yet; retired floors have no min).
    */
  def violations(
      mins: Map[String, Double],
      floors: Map[String, Double],
      factor: Double = 2.0): Seq[(String, Double, Double)] =
    mins.toSeq.sorted.flatMap { case (name, m) =>
      floors.get(name) match {
        case Some(floor) if m > floor * factor => Some((name, m, floor))
        case _ => None
      }
    }

  /** Minimal flat-JSON object reader for the two artifacts (numbers and
    * nulls only — the exact shape Bench emits). Returns empty when the
    * file is missing, so a fresh clone without artifacts stays green.
    */
  def readNumberMap(path: String, key: Option[String]): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isReadable(p)) return Map.empty
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val obj = key match {
      case Some(k) =>
        val at = body.indexOf("\"" + k + "\":{")
        if (at < 0) return Map.empty
        val start = body.indexOf('{', at)
        var depth = 0
        var i = start
        var end = -1
        while (end < 0 && i < body.length) {
          body.charAt(i) match {
            case '{' => depth += 1
            case '}' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        if (end < 0) return Map.empty
        body.substring(start, end + 1)
      case None => body
    }
    val entry = """"([^"]+)"\s*:\s*(-?[0-9][0-9.eE+-]*|null)""".r
    entry.findAllMatchIn(obj).flatMap { m =>
      if (m.group(2) == "null") None
      else scala.util.Try(m.group(2).toDouble).toOption.map(m.group(1) -> _)
    }.toMap
  }

  /** The sf tag of a BENCH_SELF artifact ("" when unreadable). */
  def artifactSf(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isReadable(p)) return ""
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
  }
}
