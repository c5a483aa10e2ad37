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
          // load FIRST: if the read throws (file mid-write), lastModified
          // stays put and the next poll retries this version instead of
          // silently losing the edit forever
          values = load()
          lastModified = m
          // each refresh individually guarded: one property whose new value
          // fails its validator must not abort the refresh of every other
          // bound property for this file version (it keeps its last-good
          // value; the others still update)
          bound.get().foreach(f => try f() catch { case _: Exception => () })
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

  /** Validate every property the file currently sets against `defs`: values
    * must parse to the definition's type AND pass its validator. Returns one
    * message per violation (empty = clean); unknown keys are reported too,
    * so a typo'd property name can't silently fall back to the default.
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
