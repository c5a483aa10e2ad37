package graft.config

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** P3 — dynamic property supplier backed by a watched file, the engine's
  * analog of the reference's Central Dogma supplier
  * (`centraldogma/.../CentralDogmaPropertySupplier.java:81-344`): an external
  * config source feeds hot-reloadable properties; registered
  * [[DynamicProperty]] instances are re-driven on every observed change.
  *
  * Format: one `key=value` per line, `#` comments. Values parse by the
  * dynamic property's current type (Long / Int / Boolean / String /
  * comma-separated list). In a Spark deployment the refresh happens on the
  * driver and propagates at trigger boundaries (broadcast refresh or query
  * restart for structural knobs — SURVEY.md §2.8 P4).
  */
final class FilePropertySupplier(path: Path, pollMillis: Long = 1000L)
    extends PropertySupplier with AutoCloseable {

  @volatile private var values: Map[String, String] = load()
  @volatile private var closed = false
  // registrations live in an AtomicReference: the old code synchronized on
  // the mutable `bound` field itself, so a bind racing the watcher could
  // lock different list instances and lose a registration
  private val bound =
    new java.util.concurrent.atomic.AtomicReference[List[() => Unit]](Nil)

  private val watcher = new Thread(null, () => {
    var lastModified = 0L
    while (!closed) {
      try {
        val m = if (Files.exists(path)) Files.getLastModifiedTime(path).toMillis else 0L
        if (m != lastModified) {
          lastModified = m
          values = load()
          bound.get().foreach(_.apply())
        }
      } catch { case _: Exception => /* keep last-good config */ }
      Thread.sleep(pollMillis)
    }
  }, "graft-config-watcher", 256 * 1024)
  watcher.setDaemon(true)
  watcher.start()

  private def load(): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else Files.readAllLines(path).asScala
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap

  override def get[T](d: PropertyDefinition[T]): Option[T] =
    values.get(d.name).map(raw => parseAs(raw, d.default).asInstanceOf[T])

  private def parseAs(raw: String, like: Any): Any = like match {
    case _: Long => raw.toLong
    case _: Int => raw.toInt
    case _: Boolean => raw.toBoolean
    case _: Seq[_] => if (raw.isEmpty) Seq.empty[String] else raw.split(',').map(_.trim).toSeq
    case _ => raw
  }

  /** Keep `dyn` in sync with the file: every observed change re-resolves and
    * sets the property (listeners fire on actual value changes only).
    */
  def bind[T](dyn: DynamicProperty[T]): Unit = {
    val refresh: () => Unit = () =>
      get(dyn.definition).foreach(v => dyn.set(v))
    bound.updateAndGet(refresh :: _)
    refresh()
  }

  override def close(): Unit = closed = true
}
