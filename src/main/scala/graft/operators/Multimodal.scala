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

  /** Content-defined chunking (Rabin-style CDC) over opaque binary
    * payloads — the byte-level dedup primitive for multimodal corpora:
    * identical media segments dedup across documents even when embedded
    * at different offsets, because chunk boundaries depend only on LOCAL
    * content. A boundary sits at byte offset p (`windowBytes` ≤ p <
    * byte_len) iff the portable 60-bit hash of the `windowBytes`-byte
    * window ending at p has its low `maskBits` bits zero — expected
    * chunk length 2^maskBits bytes. The predicate is stateless per
    * position (no sequential min/max-chunk clamps), which is what makes
    * it shift-invariant AND fully relational: both engines replay every
    * boundary exactly. A production deployment swaps the md5 window
    * hash for a codegen'd gear/rolling-hash Expression (one pass per
    * payload instead of one hash per position); the chunk assembly and
    * dedup plumbing are identical.
    *
    * Chunks assemble without any per-doc array state: boundary rows ∪ a
    * start-of-payload row, then `lead(start) over (partition by media
    * order by start)` closes each chunk — one keyed shuffle, no
    * collect_list. Empty payloads yield one zero-length chunk (md5 of
    * the empty string, engine-portable). Output: (media_id, chunk_no,
    * start, chunk_len, chunk_md5).
    */
  def cdcChunks(media: DataFrame, windowBytes: Int, maskBits: Int): DataFrame = {
    require(windowBytes >= 1, s"need windowBytes >= 1, got $windowBytes")
    require(maskBits >= 0 && maskBits <= 32, s"need 0 <= maskBits <= 32, got $maskBits")
    val m = meta(media) // cheap projection; re-derived per consumer
    val modulus = 1L << maskBits
    // candidate positions explode (codegen'd md5 per position — the
    // hex-plane window is the 2w chars ending at 2p)
    val bounds = m.filter(col("byte_len") > windowBytes)
      .select(col("media_id"),
        explode(sequence(lit(windowBytes), col("byte_len") - 1)).as("start"))
      .filter(graft.operators.Dedup.portableHash64(
        col("hx").substr((col("start") - windowBytes) * 2 + 1,
          lit(windowBytes * 2))) % modulus === 0)
    val starts = m.select(col("media_id"), lit(0).as("start"))
      .unionByName(bounds)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("start"))
    starts.join(m.select(col("media_id"), col("byte_len"), col("hx")),
        Seq("media_id"))
      .withColumn("chunk_no", row_number().over(w).cast("long") - 1)
      .withColumn("_mmEnd", coalesce(lead(col("start"), 1).over(w),
        col("byte_len")))
      .select(col("media_id"), col("chunk_no"),
        col("start").cast("long").as("start"),
        (col("_mmEnd") - col("start")).cast("long").as("chunk_len"),
        md5(col("hx").substr(col("start") * 2 + 1,
          (col("_mmEnd") - col("start")) * 2)).as("chunk_md5"))
  }

  /** Cross-document chunk dedup over [[cdcChunks]] output: every chunk
    * digest occurring more than once, with its occurrence and document
    * counts and the least witness — the "store each block once" CAS
    * inventory. One partial-agg shuffle on the digest.
    */
  def cdcDedup(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_md5", "chunk_len")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("media_id")).as("n_docs"),
        min(col("media_id")).as("keep_media"))
      .filter(col("n_copies") >= 2)

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
