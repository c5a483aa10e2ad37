package graft.api

import java.util.concurrent.ConcurrentLinkedQueue

import graft.core.Task

/** Tracing SPI (`processor/.../tracing/TracingProvider.java:36+`, brave /
  * micrometer implementations in the reference): a span brackets each task's
  * processing, carrying the outcome tag. Providers are Serializable — they
  * ship to executors with the processor closure and record executor-side,
  * which is where processing actually happens in Spark (a driver-side tracer
  * would see nothing).
  *
  * Wire-up: [[TaskPipeline.thenProcessTraced]] wraps the processor; the
  * default everywhere else is [[TracingProvider.Noop]], which JITs away.
  */
trait TracingProvider extends Serializable {
  /** Called before a task is processed; returns the span to close. */
  def traceStart(task: Task[_]): TraceSpan

  /** Header-aware overload — the reference's actual signature (its
    * `traceStart` receives the ConsumedRecord, headers included, which is
    * how brave-style providers find the upstream trace context). Default
    * ignores headers so plain providers implement one method.
    */
  def traceStart(task: Task[_], headers: Map[String, Array[Byte]]): TraceSpan =
    traceStart(task)
}

trait TraceSpan {
  /** Called exactly once with the terminal outcome tag
    * ("processed" | "retry" | "discard" | "error").
    */
  def close(outcome: String): Unit
}

object TracingProvider {
  /** No-op provider (the reference's `NoopTracingProvider`). */
  object Noop extends TracingProvider {
    private object NoopSpan extends TraceSpan {
      def close(outcome: String): Unit = ()
    }
    def traceStart(task: Task[_]): TraceSpan = NoopSpan
  }

  /** JVM-recording provider for tests/metrics: every span lands in a static
    * queue as (key, outcome, durationNanos) — the lifecycle-assertion hook
    * the reference's TestTracingProvider serves.
    */
  final class Recording extends TracingProvider {
    def traceStart(task: Task[_]): TraceSpan = {
      val key = if (task.key == null) "" else new String(task.key, "UTF-8")
      val t0 = System.nanoTime()
      (outcome: String) => Recording.spans.add((key, outcome, System.nanoTime() - t0))
    }
  }
  object Recording {
    val spans = new ConcurrentLinkedQueue[(String, String, Long)]()
  }
}

/** W3C Trace Context (`traceparent` header, public standard
  * https://www.w3.org/TR/trace-context/): `00-{32 hex trace-id}-{16 hex
  * parent-id}-{2 hex flags}`. The propagation carrier the brave/micrometer
  * providers serve in the reference (`brave/.../KafkaTraceInjector` reads and
  * writes B3/W3C headers on the Kafka record).
  */
final case class TraceContext(traceId: String, spanId: String, sampled: Boolean) {
  def render: String = s"00-$traceId-$spanId-${if (sampled) "01" else "00"}"
}

object TraceContext {
  val HeaderKey = "traceparent"

  private val Pattern = "00-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})".r

  def parse(s: String): Option[TraceContext] = s match {
    case Pattern(t, p, f) if t != "0" * 32 && p != "0" * 16 =>
      Some(TraceContext(t, p, (Integer.parseInt(f, 16) & 1) == 1))
    case _ => None
  }

  def fromHeaders(headers: Map[String, Array[Byte]]): Option[TraceContext] =
    headers.get(HeaderKey).flatMap(b => parse(new String(b, "UTF-8")))
}

/** Propagation-style provider (the `BraveTracingProvider.java` analog,
  * proving the SPI composes): continues the trace found in the record's
  * `traceparent` header — the opened span becomes a CHILD of the upstream
  * span, same trace id — or starts a new root when no context arrived. Span
  * recording delegates to any inner [[TracingProvider]] (composition), and
  * the full (traceId, parentId, spanId, outcome) tuple lands in the static
  * journal for assertions/export.
  *
  * Ids are deterministic (md5 of the task identity under the parent) rather
  * than random, matching the engine-wide no-driver-RNG stance; a real
  * OpenTelemetry bridge would swap `childId` for its own id generator and
  * the journal for its exporter — both are single seams.
  *
  * [[inject]] renders the context header for downstream produce, which is
  * how the retry-topic hop keeps the trace connected (the reference injects
  * into the retry record exactly there).
  */
final class PropagatingTracingProvider(inner: TracingProvider) extends TracingProvider {
  import PropagatingTracingProvider._

  private def hex(s: String, n: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString.take(n)
  }

  private def childId(ctx: TraceContext, task: Task[_]): String = {
    val key = if (task.key == null) "" else new String(task.key, "UTF-8")
    hex(s"${ctx.traceId}:${ctx.spanId}:$key:${task.metadata.timestampMillis}", 16)
  }

  def traceStart(task: Task[_]): TraceSpan = traceStart(task, Map.empty)

  override def traceStart(task: Task[_], headers: Map[String, Array[Byte]]): TraceSpan = {
    val parent = TraceContext.fromHeaders(headers)
    val key = if (task.key == null) "" else new String(task.key, "UTF-8")
    val traceId = parent.map(_.traceId)
      .getOrElse(hex(s"root:$key:${task.metadata.timestampMillis}", 32))
    val self = TraceContext(traceId,
      childId(TraceContext(traceId, parent.map(_.spanId).getOrElse("0" * 16),
        sampled = true), task),
      sampled = parent.forall(_.sampled))
    val innerSpan = inner.traceStart(task, headers)
    (outcome: String) => {
      journal.add((traceId, parent.map(_.spanId).getOrElse(""), self.spanId, outcome))
      lastSpan.set(self)
      innerSpan.close(outcome)
    }
  }

  /** The `traceparent` header value a downstream produce (retry/shaping
    * topic) should carry to continue the trace from `ctx`.
    */
  def inject(ctx: TraceContext): (String, Array[Byte]) =
    TraceContext.HeaderKey -> ctx.render.getBytes("UTF-8")
}

object PropagatingTracingProvider {
  /** (traceId, parentSpanId ("" = root), spanId, outcome) per closed span. */
  val journal = new ConcurrentLinkedQueue[(String, String, String, String)]()
  /** Most recently closed span's context — the handle tests/injectors use. */
  val lastSpan = new java.util.concurrent.atomic.AtomicReference[TraceContext]()
}
