package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.core.{LegacyEnvelope, MetaCodec, TaskMetadata}

class ControlPlaneSpec extends AnyFunSuite {

  test("first supplier providing a property wins (P2 precedence)") {
    val props = new Properties(Seq(
      new MapPropertySupplier(Map("decaton.retry.backoff.ms" -> 500L)),
      new MapPropertySupplier(Map(
        "decaton.retry.backoff.ms" -> 900L,
        "decaton.partition.concurrency" -> 8))))
    assert(props.resolve(EngineProperties.RetryBackoffMs) == 500L)
    assert(props.resolve(EngineProperties.PartitionConcurrency) == 8)
    // nothing supplies processing rate -> default
    assert(props.resolve(EngineProperties.ProcessingRate) == -1L)
  }

  test("validators reject invalid values") {
    val props = new Properties(Seq(new MapPropertySupplier(Map("decaton.partition.concurrency" -> 0))))
    intercept[IllegalArgumentException](props.resolve(EngineProperties.PartitionConcurrency))
  }

  test("dynamic property hot-swaps and notifies listeners (P1 dynamic)") {
    val props = new Properties(Nil)
    val dyn = props.dynamic(EngineProperties.ProcessingRate)
    var observed = List.empty[(Long, Long)]
    dyn.onChange((o, n) => observed ::= (o, n))
    dyn.set(100L)
    dyn.set(100L) // no-op: unchanged
    dyn.set(0L)   // pause semantics
    assert(dyn.value == 0L)
    assert(observed == List((100L, 0L), (-1L, 100L)))
    intercept[IllegalArgumentException](dyn.set(-5L))
  }

  test("legacy envelope roundtrips and carries metadata (protocol migration)") {
    val m = TaskMetadata(1234L, "app", "inst", 2L, 5678L)
    val payload = """{"k": 1}""".getBytes("UTF-8")
    val bytes = LegacyEnvelope.encode(LegacyEnvelope.Envelope(m, payload))
    val dec = LegacyEnvelope.decode(bytes)
    assert(dec.metadata == m)
    assert(dec.serializedTask.toSeq == payload.toSeq)
  }

  test("decodeEither: header wins, envelope falls back, garbage passes through") {
    val m = TaskMetadata(1L, "a", "b", 0L, 2L)
    val payload = "payload".getBytes("UTF-8")
    // header present
    val (m1, v1) = LegacyEnvelope.decodeEither(Some(MetaCodec.encode(m)), payload)
    assert(m1 == m && v1.toSeq == payload.toSeq)
    // envelope value
    val env = LegacyEnvelope.encode(LegacyEnvelope.Envelope(m, payload))
    val (m2, v2) = LegacyEnvelope.decodeEither(None, env)
    assert(m2 == m && v2.toSeq == payload.toSeq)
    // non-protobuf garbage: empty metadata, raw bytes preserved (E2 tolerance)
    val garbage = """{"json": true}""".getBytes("UTF-8")
    val (m3, v3) = LegacyEnvelope.decodeEither(None, garbage)
    assert(m3 == TaskMetadata() && v3.toSeq == garbage.toSeq)
  }
}
