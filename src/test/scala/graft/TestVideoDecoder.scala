package graft

import graft.operators.Multimodal

/** Test-scope [[Multimodal.VideoDecoderSpi]] provider — the stand-in for
  * a deployment's codec jar, registered the same way (a
  * `META-INF/services/graft.operators.Multimodal$VideoDecoderSpi`
  * resource), so the spec exercises the REAL ServiceLoader plug path
  * end-to-end. "Codec": raw 4×4 8-bit gray frames, 16 bytes per frame,
  * luma sum = unsigned byte sum — deterministic and closed-form so the
  * spec can pin every field.
  */
class TestVideoDecoder extends Multimodal.VideoDecoderSpi {
  override def supports(mime: String): Boolean = mime == "video/x-graft-raw"

  override def decode(mediaId: Long, mime: String,
      payload: Array[Byte]): Multimodal.VideoMeta = {
    require(payload.length % 16 == 0,
      s"media $mediaId: torn x-graft-raw frame (${payload.length} bytes)")
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    Multimodal.VideoMeta(mediaId, "x-graft-raw", 4, 4,
      payload.length / 16L, sum)
  }
}
