package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{MetaCodec, TaskMetadata}

class MetaCodecSpec extends AnyFunSuite {

  test("encodes to canonical protobuf bytes (hand-computed vector)") {
    // field 1 varint 1000 -> 08 E8 07 ; field 2 "ab" -> 12 02 61 62
    // field 4 varint 1 -> 20 01 ; field 5 varint 300 -> 28 AC 02
    val m = TaskMetadata(1000L, "ab", "", 1L, 300L)
    val expected = Array(0x08, 0xe8, 0x07, 0x12, 0x02, 0x61, 0x62, 0x20, 0x01, 0x28, 0xac, 0x02)
      .map(_.toByte)
    assert(MetaCodec.encode(m).toSeq == expected.toSeq)
  }

  test("zero/empty fields are omitted (proto3 default elision)") {
    assert(MetaCodec.encode(TaskMetadata()).isEmpty)
  }

  test("decodes messages with unknown fields (forward compat)") {
    // field 6 varint 7 (unknown) + field 1 varint 5
    val bytes = Array(0x30, 0x07, 0x08, 0x05).map(_.toByte)
    assert(MetaCodec.decode(bytes) == TaskMetadata(timestampMillis = 5L))
  }

  test("roundtrip property (seeded random)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val m = TaskMetadata(
        timestampMillis = rnd.nextLong().abs,
        sourceApplicationId = rnd.alphanumeric.take(rnd.nextInt(40)).mkString,
        sourceInstanceId = rnd.alphanumeric.take(rnd.nextInt(40)).mkString,
        retryCount = rnd.nextInt(1000).toLong,
        scheduledTimeMillis = rnd.nextLong().abs)
      assert(MetaCodec.decode(MetaCodec.encode(m)) == m)
    }
  }

  test("truncated input throws") {
    intercept[IllegalArgumentException] {
      MetaCodec.decode(Array(0x08.toByte, 0x80.toByte)) // unterminated varint
    }
  }
}
