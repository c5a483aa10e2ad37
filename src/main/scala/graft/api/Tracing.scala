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
