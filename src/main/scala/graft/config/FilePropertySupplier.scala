package graft.config

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Shared machinery of the polling property suppliers (file-backed and
  * remote): a daemon poller fetches (content, version); on a version change
  * the content is parsed (`key=value` lines, `#` comments) and every bound
  * [[DynamicProperty]] is re-driven. Values parse by the property's type
  * (Long / Int / Boolean / String / comma-separated list). In a Spark
  * deployment the refresh happens on the driver and propagates at trigger
  * boundaries (broadcast refresh or query restart for structural knobs —
  * SURVEY.md §2.8 P4).
  */
abstract class PollingPropertySupplier(pollMillis: Long, threadName: String)
    extends PropertySupplier with AutoCloseable {

  /** Fetch the current config: (content, version token). None / a throw ⇒
    * keep last-good values and retry next poll.
    */
  protected def poll(): Option[(String, String)]

  @volatile private var values: Map[String, String] = Map.empty
  @volatile private var closed = false
  // registrations live in an AtomicReference: binds racing the poller must
  // not lose a registration
  private val bound =
    new java.util.concurrent.atomic.AtomicReference[List[() => Unit]](Nil)

  // synchronous first fetch so get() works immediately after construction
  // (same posture as the old file supplier's eager load())
  private var lastVersion: String = ""
  refresh()

  private def refresh(): Unit =
    try {
      poll() match {
        case Some((content, version)) if version != lastVersion =>
          // parse FIRST: if it throws (source mid-write), lastVersion stays
          // put and the next poll retries this version instead of silently
          // losing the edit forever
          values = PollingPropertySupplier.parse(content)
          lastVersion = version
          // each refresh individually guarded: one property whose new value
          // fails its validator must not abort the refresh of every other
          // bound property for this version (it keeps its last-good value;
          // the others still update)
          bound.get().foreach(f => try f() catch { case _: Exception => () })
        case _ => ()
      }
    } catch { case _: Exception => /* keep last-good config */ }

  private val poller = new Thread(null, () => {
    while (!closed) {
      Thread.sleep(pollMillis)
      refresh()
    }
  }, threadName, 256 * 1024)
  poller.setDaemon(true)
  poller.start()

  override def get[T](d: PropertyDefinition[T]): Option[T] =
    values.get(d.name).map(raw => parseAs(raw, d.default).asInstanceOf[T])

  private def parseAs(raw: String, like: Any): Any = like match {
    case _: Long => raw.toLong
    case _: Int => raw.toInt
    case _: Boolean => raw.toBoolean
    case _: Seq[_] => if (raw.isEmpty) Seq.empty[String] else raw.split(',').map(_.trim).toSeq
    case _ => raw
  }

  /** Keep `dyn` in sync with the source: every observed change re-resolves
    * and sets the property (listeners fire on actual value changes only).
    */
  def bind[T](dyn: DynamicProperty[T]): Unit = {
    val refreshOne: () => Unit = () =>
      get(dyn.definition).foreach(v => dyn.set(v))
    bound.updateAndGet(refreshOne :: _)
    refreshOne()
  }

  /** Validate every property the source currently sets against `defs`:
    * values must parse to the definition's type AND pass its validator.
    * Returns one message per violation (empty = clean); unknown keys are
    * reported too, so a typo'd property name can't silently fall back to the
    * default.
    */
  def validateAll(defs: Seq[PropertyDefinition[_]]): Seq[String] = {
    val byName = defs.map(d => d.name -> d).toMap
    values.toSeq.sortBy(_._1).flatMap { case (k, raw) =>
      byName.get(k) match {
        case None => Seq(s"unknown property '$k' (not in the published schema)")
        case Some(d) =>
          try {
            d.asInstanceOf[PropertyDefinition[Any]].validate(parseAs(raw, d.default))
            Nil
          } catch {
            case e: Exception => Seq(s"property '$k'='$raw' invalid: ${e.getMessage}")
          }
      }
    }
  }

  override def close(): Unit = closed = true
}

object PollingPropertySupplier {
  /** `key=value` lines, `#` comments — the config wire format both suppliers
    * share.
    */
  def parse(content: String): Map[String, String] =
    content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap
}

/** P3 — dynamic property supplier backed by a watched file, the engine's
  * analog of the reference's Central Dogma supplier
  * (`centraldogma/.../CentralDogmaPropertySupplier.java:81-344`): an external
  * config source feeds hot-reloadable properties; registered
  * [[DynamicProperty]] instances are re-driven on every observed change.
  * [[RemotePropertySupplier]] is the same machinery over a fetched source.
  */
final class FilePropertySupplier(path: Path, pollMillis: Long = 1000L)
    extends PollingPropertySupplier(pollMillis, "graft-config-watcher") {

  protected def poll(): Option[(String, String)] =
    if (!Files.exists(path)) Some(("", "absent"))
    else {
      val version = Files.getLastModifiedTime(path).toMillis.toString
      Some((Files.readAllLines(path).asScala.mkString("\n"), version))
    }
}

object FilePropertySupplier {
  /** Publish the property schema as JSON next to the config source — the
    * analog of the reference registering a validation schema with its config
    * service (`CentralDogmaPropertySupplier.register:192-236`), so external
    * tooling can validate edits before they land. One object per property:
    * name, JSON-ish type (derived from the default), and the default value.
    */
  def publishSchema(defs: Seq[PropertyDefinition[_]], path: java.nio.file.Path): Unit = {
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def typeOf(default: Any): String = default match {
      case _: Long | _: Int => "integer"
      case _: Boolean       => "boolean"
      case _: Seq[_]        => "array"
      case _                => "string"
    }
    def jdefault(v: Any): String = v match {
      case s: Seq[_]       => s.map(x => jstr(x.toString)).mkString("[", ",", "]")
      case s: String       => jstr(s)
      case other           => other.toString
    }
    val entries = defs.sortBy(_.name).map { d =>
      s"""    {"name": ${jstr(d.name)}, "type": ${jstr(typeOf(d.default))}, "default": ${jdefault(d.default)}}"""
    }
    val json = entries.mkString("{\n  \"properties\": [\n", ",\n", "\n  ]\n}\n")
    java.nio.file.Files.writeString(path, json)
  }
}
