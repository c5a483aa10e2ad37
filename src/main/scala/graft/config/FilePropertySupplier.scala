package graft.config

import java.nio.file.{Files, Path}

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
  @volatile private var malformedLines: Seq[String] = Nil
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
          val (parsed, bad) = PollingPropertySupplier.parseReporting(content)
          values = parsed
          malformedLines = bad
          lastVersion = version
          // each refresh individually guarded: one property whose new value
          // fails its validator must not abort the refresh of every other
          // bound property for this version (it keeps its last-good value;
          // the others still update)
          bound.get().foreach(f => try f() catch {
            case e: Exception =>
              System.err.println(s"[graft-config] property refresh threw: $e")
          })
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
    lookup(d) match {
      case PollingPropertySupplier.Value(v) => Some(v)
      // a malformed raw value ("1oo") behaves as UNSET — resolve falls back
      // to lower-precedence suppliers / the default instead of crashing the
      // query at the next trigger; validateAll reports the bad value
      case _ => None
    }

  /** Tri-state view of a key: bound properties must distinguish "the key was
    * REMOVED" (revert to the definition default — deleting a `rate=0` pause
    * line resumes the pipeline) from "the key is present but UNPARSEABLE"
    * (keep the last-good value, the reference's `DynamicProperty.checkingSet`
    * posture — a typo'd edit to a live file must not silently flip a running
    * pipeline to its default).
    */
  private[config] def lookup[T](d: PropertyDefinition[T]): PollingPropertySupplier.Lookup[T] =
    values.get(d.name) match {
      case None => PollingPropertySupplier.Absent
      case Some(raw) =>
        try PollingPropertySupplier.Value(parseAs(raw, d.default).asInstanceOf[T])
        catch { case _: Exception => PollingPropertySupplier.Malformed(raw) }
    }

  private def parseAs(raw: String, like: Any): Any = like match {
    case _: Long => raw.toLong
    case _: Int => raw.toInt
    case _: Boolean => raw.toBoolean
    case _: Seq[_] => if (raw.isEmpty) Seq.empty[String] else raw.split(',').map(_.trim).toSeq
    case _ => raw
  }

  /** Keep `dyn` in sync with the source: every observed change re-resolves
    * and sets the property (listeners fire on actual value changes only).
    * A key REMOVED after being supplied reverts the property to its
    * definition default — deleting a `rate=0` pause line must resume the
    * pipeline, not freeze it at the removed value; a key this supplier
    * never supplied leaves the property (and any caller-chosen initial)
    * untouched. A key present but UNPARSEABLE keeps the property at its
    * last-good value (it is NOT a removal — the reference's checkingSet keeps
    * last-good on an invalid update; validateAll reports the bad raw).
    * Returns a deregistration handle (the [[DynamicProperty
    * .onChange]] symmetry): a long-lived supplier must not retain every
    * property a restarted query ever bound.
    */
  def bind[T](dyn: DynamicProperty[T]): () => Unit = {
    val wasPresent = new java.util.concurrent.atomic.AtomicBoolean(false)
    val refreshOne: () => Unit = () =>
      lookup(dyn.definition) match {
        case PollingPropertySupplier.Value(v) => wasPresent.set(true); dyn.set(v)
        // keep last-good; wasPresent stays as-is so a LATER removal of the
        // (still-present) key correctly reverts to the default
        case PollingPropertySupplier.Malformed(_) => ()
        case PollingPropertySupplier.Absent =>
          if (wasPresent.getAndSet(false)) dyn.set(dyn.definition.default)
      }
    bound.updateAndGet(refreshOne :: _)
    refreshOne()
    () => { bound.updateAndGet(_.filterNot(_ eq refreshOne)); () }
  }

  /** Validate every property the source currently sets against `defs`:
    * values must parse to the definition's type AND pass its validator.
    * Returns one message per violation (empty = clean); unknown keys are
    * reported too, so a typo'd property name can't silently fall back to the
    * default.
    */
  def validateAll(defs: Seq[PropertyDefinition[_]]): Seq[String] = {
    val byName = defs.map(d => d.name -> d).toMap
    // lines parse() had to drop (no '=') are violations too: a space typo'd
    // assignment must not silently fall back to the default — exactly the
    // class of edit this method exists to catch
    malformedLines.map(l => s"malformed line (no '='): '$l'") ++
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
  /** Tri-state key lookup (see [[PollingPropertySupplier.lookup]]). */
  private[config] sealed trait Lookup[+T]
  private[config] case object Absent extends Lookup[Nothing]
  private[config] final case class Malformed(raw: String) extends Lookup[Nothing]
  private[config] final case class Value[T](v: T) extends Lookup[T]

  /** `key=value` lines, `#` comments — the config wire format both suppliers
    * share.
    */
  def parse(content: String): Map[String, String] = parseReporting(content)._1

  /** [[parse]] plus the dropped lines (non-empty, non-comment, no '=') so
    * validateAll can surface a typo'd assignment instead of silently
    * ignoring it.
    */
  def parseReporting(content: String): (Map[String, String], Seq[String]) = {
    val lines = content.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val (ok, bad) = lines.partition(_.contains("="))
    val kvs = ok.map { l =>
      val i = l.indexOf('=')
      l.substring(0, i).trim -> l.substring(i + 1).trim
    }.toMap
    (kvs, bad)
  }
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
      // version = CONTENT hash, not mtime: an edit landing in the same
      // millisecond as the last read (or a partial mid-write read, whose
      // completed form arrives without a further mtime tick on coarse
      // filesystems) would freeze an mtime token forever; a content hash
      // always converges on the final bytes (RemotePropertySupplier's rule)
      val content = Files.readString(path)
      val version = java.security.MessageDigest.getInstance("MD5")
        .digest(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      Some((content, version))
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
