package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with typed metadata,
  * and decode / feature-extract / frame-sample run as distributed
  * per-partition batch transforms.
  *
  * The decode step is a STUB — this container ships no codec libraries —
  * but it is a *deterministic* fake (unsigned-byte bucket sums), so the
  * entire distributed surface around it (binary schema, partition batching,
  * typed Dataset encoders, downstream joins/aggs) is real and verified
  * against the DuckDB oracle byte-for-byte. A real deployment swaps
  * [[decodeFeaturesStub]]'s inner loop for an actual codec call; nothing
  * else changes.
  *
  * Scale: payloads never pass through the driver; frame sampling and
  * feature extraction are narrow per-row/per-partition ops, so the only
  * shuffles are whatever the caller's aggregation needs. For real media
  * (MBs per row) set `spark.sql.files.maxPartitionBytes` so a partition's
  * worth of payloads fits executor memory.
  */
object Multimodal {

  /** Typed record: the canonical wire shape of a media row. */
  final case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])

  /** Stub decoder output: per-bucket unsigned-byte sums as fake "features".
    */
  final case class MediaFeatures(media_id: Long, n_bytes: Int, features: Array[Long])

  /** Wrap a text column as a binary payload (the testdata has no real media
    * files; UTF-8 bytes stand in for encoded frames — the engine treats
    * them as opaque either way).
    */
  def attachBlob(df: DataFrame, id: String, text: String, mime: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      lit(mime).as("mime"),
      encode(col(text), "UTF-8").as("payload"))

  /** Typed metadata projection over the opaque payload: byte length,
    * content digest, leading-bytes signature (all codegen'd expressions).
    * `hx` is the hex rendering used for engine-portable slicing.
    */
  def meta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("mime"),
      length(col("payload")).as("byte_len"),
      hex(col("payload")).as("hx")) // uppercase in Spark AND DuckDB

  /** Exact integer floor division (toward -inf, matching DuckDB `//`) —
    * Spark's int `/` yields double and `cast("int")` truncates toward zero,
    * which disagrees on negative numerators (byte_len = 0 ⇒ (0-1)/s).
    */
  private def floorDiv(a: Column, b: Int): Column =
    ((a - pmod(a, lit(b))) / b).cast("int")

  /** Frame sampling: one `frameBytes`-sized frame every `strideBytes`,
    * digested. Slicing happens on the hex rendering (2 chars/byte) so the
    * identical arithmetic runs on engines without blob slicing. Output:
    * (media_id, frame_no, frame_md5) — one row per sampled frame; empty
    * payloads emit no frames (floor((0-1)/stride) = -1, as in the oracle).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, strideBytes: Int): DataFrame = {
    val m = meta(media)
    val maxIdx = floorDiv(col("byte_len") - 1, strideBytes) // 0-based max index; -1 ⇒ none
    val frames = when(maxIdx < 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), greatest(maxIdx, lit(0))),
        i => md5(col("hx").substr(i * (strideBytes * 2) + 1, lit(frameBytes * 2)))))
    m.select(col("media_id"), posexplode(frames))
      .select(col("media_id"), col("pos").as("frame_no"), col("col").as("frame_md5"))
  }

  /** STUB resize (see class doc): downsample the payload by keeping every
    * `factor`-th byte — the deterministic stand-in for an image resize
    * kernel, operating on the same opaque-binary plumbing (a real decoder
    * would resize pixels; the engine-side schema, slicing arithmetic, and
    * verification are identical). Hex-plane slicing keeps the op
    * engine-portable. Output: (media_id, resized_len, resized_md5).
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    val m = meta(media)
    val keptBytes = floorDiv(col("byte_len") - 1, factor) + 1 // 0 for empty payloads
    val resizedHex = array_join(
      when(keptBytes <= 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), greatest(keptBytes - 1, lit(0))),
          i => col("hx").substr(i * (factor * 2) + 1, lit(2)))),
      "")
    m.select(
      col("media_id"),
      keptBytes.as("resized_len"),
      md5(resizedHex).as("resized_md5"))
  }

  /** STUB feature extraction (see class doc): features[j] = Σ of unsigned
    * byte values at positions ≡ j (mod dim). Runs as a typed per-partition
    * batch transform — the exact execution shape a vectorized decoder
    * (one codec context per partition, rows streamed through it) would use.
    */
  def decodeFeaturesStub(media: DataFrame, dim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codepath: open one decoder per partition here, close after
        rows.map { case (id, bytes) =>
          val feats = new Array[Long](dim)
          var i = 0
          while (i < bytes.length) {
            feats(i % dim) += (bytes(i) & 0xff)
            i += 1
          }
          MediaFeatures(id, bytes.length, feats)
        }
      }
  }
}
