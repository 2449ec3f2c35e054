package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "abcdefgh" * 40), // 320 bytes -> frames at 0 and 256
    (2L, "xy") // 2 bytes -> one (short) frame
  ).toDF("doc_id", "text")

  test("attachBlob produces binary payload with stable byte length") {
    val m = Multimodal.attachBlob(docs, "doc_id", "text", "text/plain")
    val lens = Multimodal.meta(m).select("media_id", "byte_len")
      .as[(Long, Int)].collect().toMap
    assert(lens === Map(1L -> 320, 2L -> 2))
  }

  test("sampleFrames emits one frame per stride, hex-sliced") {
    val m = Multimodal.attachBlob(docs, "doc_id", "text", "text/plain")
    val frames = Multimodal.sampleFrames(m, frameBytes = 64, strideBytes = 256)
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 2L, 2L -> 1L))
  }

  test("resizeStub keeps every factor-th byte") {
    val m = Multimodal.attachBlob(
      Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "doc_id", "text", "text/plain")
    val r = Multimodal.resizeStub(m, factor = 4)
      .select("media_id", "resized_len", "resized_md5")
      .as[(Long, Int, String)].head()
    assert(r._2 === 2) // bytes at offsets 0 and 4: 'a', 'e'
    // md5 of hex("a") + hex("e") = md5("6165")
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("6165".getBytes).map("%02x".format(_)).mkString
    assert(r._3 === expect)
  }

  test("empty payloads: zero frames, zero-length resize (floor-div parity)") {
    // DuckDB's (blen-1)//stride floor-divides: blen=0 ⇒ -1 ⇒ no frames and
    // resized_len 0. Truncating division would wrongly emit one frame.
    val m = Multimodal.attachBlob(
      Seq((1L, ""), (2L, "xy")).toDF("doc_id", "text"), "doc_id", "text", "text/plain")
    val frames = Multimodal.sampleFrames(m, frameBytes = 64, strideBytes = 256)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(frames === Map(2L -> 1L)) // media 1 emits no rows at all
    val resized = Multimodal.resizeStub(m, factor = 4)
      .select("media_id", "resized_len", "resized_md5")
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(resized.head._1 === 1L && resized.head._2 === 0)
    val md5empty = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes).map("%02x".format(_)).mkString
    assert(resized.head._3 === md5empty)
    assert(resized(1)._2 === 1)
  }

  test("decodeFeaturesStub: deterministic bucket sums of unsigned bytes") {
    val m = Multimodal.attachBlob(
      Seq((7L, "ab")).toDF("doc_id", "text"), "doc_id", "text", "text/plain")
    val f = Multimodal.decodeFeaturesStub(m, dim = 8).collect().head
    assert(f.media_id === 7L)
    assert(f.n_bytes === 2)
    assert(f.features.toSeq === Seq('a'.toLong, 'b'.toLong, 0L, 0L, 0L, 0L, 0L, 0L))
  }
}
