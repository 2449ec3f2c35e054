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

  // brute-force CDC in plain Scala: same boundary rule, same digests
  private def bruteCdc(text: String, w: Int, maskBits: Int): Seq[(Long, Long, Long, String)] = {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val hx = text.getBytes("UTF-8").map("%02X".format(_)).mkString
    val len = text.getBytes("UTF-8").length
    val bounds = (w until len).filter { pp =>
      java.lang.Long.parseLong(md5hex(hx.substring((pp - w) * 2, pp * 2)).take(15), 16) %
        (1L << maskBits) == 0
    }
    val starts = 0 +: bounds
    val ends = bounds :+ len
    starts.zip(ends).zipWithIndex.map { case ((st, en), i) =>
      (i.toLong, st.toLong, (en - st).toLong, md5hex(hx.substring(st * 2, en * 2)))
    }
  }

  test("cdcChunks equals brute force; chunks tile the payload") {
    val rnd = new scala.util.Random(13)
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(400))(('a' + rnd.nextInt(4)).toChar).mkString))
    val m = Multimodal.attachBlob(docs.toDF("doc_id", "text"), "doc_id", "text", "b")
    val got = Multimodal.cdcChunks(m, windowBytes = 8, maskBits = 4)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._2, c._3, c._4, c._5)).toSeq).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === bruteCdc(text, 8, 4), s"doc $id")
      // tiling: starts/lengths partition [0, len)
      val chs = got(id)
      assert(chs.map(_._3).sum === text.getBytes("UTF-8").length.toLong)
      chs.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + a._3 === b._2); case _ =>
      }
    }
  }

  test("CDC is shift-invariant: a prefix insertion preserves downstream chunks") {
    // non-repeating content so distinct digests measure true re-alignment
    val rnd = new scala.util.Random(99)
    val base = Seq.fill(3000)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, base), (2L, "XYZPREFIX-" + base))
    val m = Multimodal.attachBlob(docs.toDF("doc_id", "text"), "doc_id", "text", "b")
    val chunks = Multimodal.cdcChunks(m, windowBytes = 8, maskBits = 4)
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = chunks.filter(_._1 == 1L).map(_._5).toSet
    val d2 = chunks.filter(_._1 == 2L).map(_._5).toSet
    // all but the head chunk(s) re-align after the insertion
    val shared = d1.intersect(d2).size.toDouble / d1.size
    assert(shared > 0.8, s"only ${shared * 100}%% of chunks survived the shift")
    // and the dedup inventory sees the cross-doc repeats
    val dd = Multimodal.cdcDedup(Multimodal.cdcChunks(m, 8, 4))
      .filter(col("n_docs") === 2).count()
    assert(dd >= 1)
  }

  test("cdcChunks: empty payload is one zero-length chunk; short payload one whole chunk") {
    val m = Multimodal.attachBlob(
      Seq((1L, ""), (2L, "tiny")).toDF("doc_id", "text"), "doc_id", "text", "b")
    val got = Multimodal.cdcChunks(m, windowBytes = 8, maskBits = 4)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.length === 2)
    assert(got(0) === ((1L, 0L, 0L, 0L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("".getBytes).map("%02x".format(_)).mkString)))
    assert(got(1)._3 === 0L && got(1)._4 === 4L)
  }

  test("decodeFeaturesStub: deterministic bucket sums of unsigned bytes") {
    val m = Multimodal.attachBlob(
      Seq((7L, "ab")).toDF("doc_id", "text"), "doc_id", "text", "text/plain")
    val f = Multimodal.decodeFeaturesStub(m, dim = 8).collect().head
    assert(f.media_id === 7L)
    assert(f.n_bytes === 2)
    assert(f.features.toSeq === Seq('a'.toLong, 'b'.toLong, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("decodeImageMeta: real ImageIO decode of generated BMPs matches the closed form (all pad widths)") {
    // w = 4..8 exercises every 4-byte row padding (pad 0,1,2,3); the
    // closed-form luma of gray pixel v is v, so the decoded sum equals
    // sum over i < w*h of ((id*31 + i)*7) % 256 — if ANY pixel, row
    // order, or padding byte were misdecoded, some sum would differ
    val dims = Seq((10L, 4, 3), (11L, 5, 4), (12L, 6, 5), (13L, 7, 2), (14L, 8, 1))
    val media = Multimodal.encodeBmpGray(
      dims.toDF("doc_id", "w", "h"), "doc_id", "w", "h")
    val got = Multimodal.decodeImageMeta(media)
      .collect().map(m => m.media_id -> m).toMap
    for ((id, w, h) <- dims) {
      val m = got(id)
      assert(m.format === "bmp", s"media $id")
      assert((m.width, m.height) === ((w, h)), s"media $id")
      assert(m.n_pixels === w.toLong * h)
      val expect = (0L until w.toLong * h).map(i => ((id * 31 + i) * 7) % 256).sum
      assert(m.luma_sum === expect, s"media $id: decoded luma must equal closed form")
    }
  }

  test("decodeImageMeta: format-agnostic — the same pixels as PNG decode to the same metadata") {
    // route one image through a DIFFERENT codec: re-encode the BMP's
    // pixels as PNG with ImageIO and decode through the same operator —
    // proves decodeImageMeta drives the codec registry, not a BMP header
    // walk (and that the luma sum is a property of the pixels, not the
    // container format)
    import spark.implicits._
    val bmp = Multimodal.encodeBmpGray(
      Seq((42L, 6, 5)).toDF("doc_id", "w", "h"), "doc_id", "w", "h")
      .select("payload").as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val pngMedia = Seq((42L, "image/png", baos.toByteArray))
      .toDF("media_id", "mime", "payload")
    val m = Multimodal.decodeImageMeta(pngMedia).collect().head
    assert(m.format === "png")
    assert((m.width, m.height, m.n_pixels) === ((6, 5, 30L)))
    val expect = (0L until 30L).map(i => ((42L * 31 + i) * 7) % 256).sum
    assert(m.luma_sum === expect)
    // corrupt payload fails loudly with the media id
    val bad = Seq((7L, "x", Array[Byte](1, 2, 3))).toDF("media_id", "mime", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageMeta(bad).collect()
    }
    assert(e.getMessage.contains("media 7") ||
      Option(e.getCause).exists(_.getMessage.contains("media 7")))
  }
}
