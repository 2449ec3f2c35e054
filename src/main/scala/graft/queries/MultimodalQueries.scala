package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.queries.Tables.t

/** Multimodal-column queries: binary payloads (UTF-8 bytes of `documents.
  * text` stand in for encoded media) with typed metadata, frame sampling,
  * a REAL javax.imageio decode (deterministic BMP payloads, closed-form
  * oracle — q_media_decode), and the stubbed-but-deterministic feature
  * decode for the codec-less modalities. Every query — the per-partition
  * mapPartitions decoders included — is verified byte-exact against
  * DuckDB (integer pixel/bucket sums are engine-portable).
  */
object MultimodalQueries {

  private def media(s: org.apache.spark.sql.SparkSession, d: String) =
    Multimodal.attachBlob(t(s, d, "documents"), "doc_id", "text", "text/plain")

  val all: Seq[Q] = Seq(

    // typed metadata over the opaque payload
    Q("q_media_meta", Some(
      "SELECT doc_id, 'text/plain' AS mime, octet_length(encode(text)) AS byte_len, " +
      "md5(hex(encode(text))) AS content_md5, " +
      "substring(hex(encode(text)), 1, 16) AS header_hex FROM documents"))(
      (s, d) =>
        Multimodal.meta(media(s, d)).select(
          col("media_id").as("doc_id"), col("mime"), col("byte_len"),
          md5(col("hx")).as("content_md5"),
          col("hx").substr(1, 16).as("header_hex"))),

    // frame sampling: 64-byte frame every 256 bytes, digested per frame
    Q("q_media_frames", Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS blen FROM documents),
        |f AS (SELECT doc_id, unnest(list_transform(range((blen - 1) // 256 + 1),
        |  i -> {'fno': i, 'fmd5': md5(substring(hx, (1 + i * 512)::BIGINT, 128))})) AS fr
        |  FROM b)
        |SELECT doc_id, fr.fno AS frame_no, fr.fmd5 AS frame_md5 FROM f""".stripMargin))(
      (s, d) =>
        Multimodal.sampleFrames(media(s, d), frameBytes = 64, strideBytes = 256)
          .select(col("media_id").as("doc_id"), col("frame_no"), col("frame_md5"))),

    // STUB resize: every-4th-byte downsample on the hex plane, digest
    // verified exactly in both engines.
    Q("q_media_resize", Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS blen FROM documents)
        |SELECT doc_id, ((blen - 1) // 4 + 1) AS resized_len,
        |  md5(array_to_string(list_transform(range((blen - 1) // 4 + 1),
        |    i -> substring(hx, (i * 8 + 1)::BIGINT, 2)), '')) AS resized_md5
        |FROM b""".stripMargin))(
      (s, d) =>
        Multimodal.resizeStub(media(s, d), factor = 4)
          .select(col("media_id").as("doc_id"), col("resized_len"), col("resized_md5"))),

    // STUB decode → per-bucket unsigned-byte sums, exploded. This drives
    // the typed mapPartitions path end-to-end; the oracle recomputes the
    // same sums from hex pairs — exact integers.
    Q("q_media_features", Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS blen FROM documents),
        |f AS (SELECT doc_id, unnest(list_transform(range(8), j -> {'bucket': j,
        |  'byte_sum': CAST(coalesce(list_sum(list_transform(
        |     list_filter(range(blen), i -> i % 8 = j),
        |     i -> ('0x' || substring(hx, (i * 2 + 1)::BIGINT, 2))::BIGINT)), 0) AS BIGINT)})) AS e
        |  FROM b)
        |SELECT doc_id, e.bucket AS bucket, e.byte_sum AS byte_sum FROM f""".stripMargin))(
      (s, d) =>
        Multimodal.decodeFeaturesStub(media(s, d), dim = 8).toDF()
          .select(col("media_id").as("doc_id"), posexplode(col("features")))
          .select(col("doc_id"), col("pos").as("bucket"), col("col").as("byte_sum"))),

    // REAL image decode via javax.imageio (the JDK's own codec — no
    // external library): deterministic gray BMPs are built per document
    // (w = 4 + doc_id%5, h = 3 + doc_id%7, pixel = ((doc_id·31+i)·7)%256)
    // and decoded through the actual ImageIO reader; the oracle computes
    // width/height/luma in CLOSED FORM from the same integers, so the
    // row hashes match iff the codec path reproduces every pixel. The
    // per-pixel BT.601 luma of a gray pixel v is exactly v.
    Q("q_media_decode", Some(
      """WITH p AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
        |  FROM documents)
        |SELECT doc_id, 'bmp' AS format, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_sum(list_transform(range(w * h),
        |    i -> ((doc_id * 31 + i) * 7) % 256)) AS BIGINT) AS luma_sum
        |FROM p""".stripMargin))(
      (s, d) =>
        Multimodal.decodeImageMeta(Multimodal.encodeBmpGray(
            t(s, d, "documents").select(col("doc_id"),
              (lit(4) + pmod(col("doc_id"), lit(5))).as("w"),
              (lit(3) + pmod(col("doc_id"), lit(7))).as("h")),
            "doc_id", "w", "h")).toDF()
          .select(col("media_id").as("doc_id"), col("format"),
            col("width"), col("height"), col("n_pixels"), col("luma_sum"))),

    // REAL audio decode via javax.sound.sampled (the JDK's own audio
    // codec registry — no external library): deterministic mono 16-bit
    // PCM WAVs are built per document (n = 500 + doc_id%257 samples at
    // 8/12/16 kHz, sample i = ((doc_id·31+i)·7)%65536 − 32768) and
    // decoded through the actual AudioSystem reader; the oracle computes
    // frame count and the exact signed sample sum in CLOSED FORM from
    // the same integers, so the row hashes match iff the codec path
    // reproduces every sample.
    Q("q_audio_decode", Some(
      """WITH p AS (SELECT doc_id, 500 + doc_id % 257 AS n,
        |  8000 + (doc_id % 3) * 4000 AS sr FROM documents)
        |SELECT doc_id, 'wave' AS container, 'PCM_SIGNED' AS encoding,
        |  CAST(sr AS INT) AS sample_rate, 1 AS channels, 16 AS bits,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(range(n),
        |    i -> (doc_id * 31 + i) * 7 % 65536 - 32768)) AS BIGINT) AS sample_sum
        |FROM p""".stripMargin))(
      (s, d) =>
        Multimodal.decodeAudioMeta(Multimodal.encodeWavPcm(
            t(s, d, "documents").select(col("doc_id"),
              (lit(500) + pmod(col("doc_id"), lit(257))).as("n"),
              (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000).as("sr")),
            "doc_id", "n", "sr")).toDF()
          .select(col("media_id").as("doc_id"), col("container"),
            col("encoding"), col("sample_rate"), col("channels"),
            col("bits"), col("n_frames"), col("sample_sum"))),

    // per-window exact sample statistics over the decoded PCM — the
    // audio quality gate (silence = near-zero energy, clipping = peak
    // pinned to the sample range), all integers: window sums, sums of
    // squares, and peak |sample| recomputed in closed form by the
    // oracle, so the hashes match iff the codec + the window fold
    // reproduce every sample exactly. 128-frame windows, short tail.
    Q("q_audio_windows", Some(
      """WITH p AS (SELECT doc_id, 500 + doc_id % 257 AS n FROM documents),
        |w AS (SELECT doc_id, n, unnest(range((n + 127) // 128)) AS wno FROM p)
        |SELECT doc_id, CAST(wno AS BIGINT) AS window_no,
        |  CAST(least(128, n - wno * 128) AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(range(wno * 128, least(n, wno * 128 + 128)),
        |    i -> (doc_id * 31 + i) * 7 % 65536 - 32768)) AS BIGINT) AS sample_sum,
        |  CAST(list_sum(list_transform(range(wno * 128, least(n, wno * 128 + 128)),
        |    i -> ((doc_id * 31 + i) * 7 % 65536 - 32768)
        |       * ((doc_id * 31 + i) * 7 % 65536 - 32768))) AS BIGINT) AS sum_sq,
        |  CAST(list_max(list_transform(range(wno * 128, least(n, wno * 128 + 128)),
        |    i -> abs((doc_id * 31 + i) * 7 % 65536 - 32768))) AS INT) AS peak_abs
        |FROM w""".stripMargin))(
      (s, d) =>
        Multimodal.audioWindowStats(Multimodal.encodeWavPcm(
            t(s, d, "documents").select(col("doc_id"),
              (lit(500) + pmod(col("doc_id"), lit(257))).as("n"),
              lit(16000).as("sr")),
            "doc_id", "n", "sr"), windowFrames = 128).toDF()
          .select(col("media_id").as("doc_id"), col("window_no"),
            col("n_samples"), col("sample_sum"), col("sum_sq"),
            col("peak_abs"))),

    // the per-media audio GATE verdict over the window primitives —
    // silence (zero-energy windows) bounded at 100000 ppm, clipping =
    // any window whose peak |sample| pins the 16-bit range (32767; the
    // closed form emits -32768 whenever (doc_id·31+i)·7 ≡ 0 mod 65536,
    // so a real clipped population exists). The oracle re-folds every
    // window AND the keep decision in closed form — integer
    // cross-multiplication, no float ratio.
    Q("q_audio_gate", Some(
      """WITH p AS (SELECT doc_id, 500 + doc_id % 257 AS n FROM documents),
        |w AS (SELECT doc_id, n, unnest(range((n + 127) // 128)) AS wno FROM p),
        |s AS (SELECT doc_id,
        |  list_sum(list_transform(range(wno * 128, least(n, wno * 128 + 128)),
        |    i -> ((doc_id * 31 + i) * 7 % 65536 - 32768)
        |       * ((doc_id * 31 + i) * 7 % 65536 - 32768))) AS sq,
        |  list_max(list_transform(range(wno * 128, least(n, wno * 128 + 128)),
        |    i -> abs((doc_id * 31 + i) * 7 % 65536 - 32768))) AS pk
        |  FROM w)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
        |  CAST(sum(CASE WHEN pk >= 32767 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(pk) AS INT) AS peak_abs,
        |  (sum(CASE WHEN sq = 0 THEN 1 ELSE 0 END) * 1000000 <= 100000 * count(*)
        |    AND sum(CASE WHEN pk >= 32767 THEN 1 ELSE 0 END) = 0) AS keep
        |FROM s GROUP BY doc_id""".stripMargin))(
      (s, d) =>
        Multimodal.audioGate(Multimodal.encodeWavPcm(
            t(s, d, "documents").select(col("doc_id"),
              (lit(500) + pmod(col("doc_id"), lit(257))).as("n"),
              lit(16000).as("sr")),
            "doc_id", "n", "sr"), windowFrames = 128,
          maxSilencePpm = 100000L, peakCeiling = 32767).toDF()
          .select(col("media_id").as("doc_id"), col("n_windows"),
            col("n_silent"), col("n_clipped"), col("peak_abs"),
            col("keep"))),

    // 64-bit energy-profile audio fingerprint (the time-domain dHash):
    // 65 windows of 7 samples, bit w set iff energy(w+1) > energy(w) —
    // the oracle recomputes every sample, window energy, comparison,
    // and the signed bit packing in closed form, so the hash matches
    // iff codec + window fold + comparator are all exact.
    Q("q_audio_fingerprint", Some(
      """WITH p AS (SELECT doc_id, 500 + doc_id % 257 AS n FROM documents),
        |e AS (SELECT doc_id, n, list_transform(range(65), w ->
        |  list_sum(list_transform(range(w * 7, least(n, w * 7 + 7)),
        |    i -> ((doc_id * 31 + i) * 7 % 65536 - 32768)
        |       * ((doc_id * 31 + i) * 7 % 65536 - 32768)))) AS es FROM p)
        |SELECT doc_id, CAST((n + 6) // 7 AS BIGINT) AS n_windows,
        |  CAST(list_sum(list_transform(range(64), b ->
        |    CASE WHEN es[CAST(b AS INT) + 2] > es[CAST(b AS INT) + 1] THEN
        |      CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << CAST(b AS INT)) END
        |    ELSE 0 END)) AS BIGINT) AS fp
        |FROM e""".stripMargin))(
      (s, d) =>
        Multimodal.audioFingerprint(Multimodal.encodeWavPcm(
            t(s, d, "documents").select(col("doc_id"),
              (lit(500) + pmod(col("doc_id"), lit(257))).as("n"),
              lit(16000).as("sr")),
            "doc_id", "n", "sr"), windowFrames = 7).toDF()
          .select(col("media_id").as("doc_id"), col("n_windows"), col("fp"))),

    // audio near-dup over a corpus with PLANTED volume-normalized
    // duplicates: every 5th stream re-encoded at 2× volume (every
    // window energy ×4 → identical fingerprint, unrelated bytes).
    // Banded 4×16-bit candidates + exact verify ≡ the oracle's
    // brute-force O(n²) pair join by pigeonhole (3 < 4 bands); the
    // oracle re-derives every fingerprint closed-form.
    Q("q_audio_neardup", Some(
      """WITH docs AS (SELECT doc_id, 500 + doc_id % 257 AS n FROM documents),
        |pop AS (
        |  SELECT doc_id AS media_id, doc_id AS seed, n, 1 AS s FROM docs
        |  UNION ALL
        |  SELECT doc_id + 10000, doc_id, n, 2 FROM docs WHERE doc_id % 5 = 0),
        |e AS (SELECT media_id, list_transform(range(65), w ->
        |  list_sum(list_transform(range(w * 7, least(n, w * 7 + 7)),
        |    i -> ((seed + 1) * (i + 7) % 65536 * 2654435761 % 16384 - 8192) * s
        |       * ((seed + 1) * (i + 7) % 65536 * 2654435761 % 16384 - 8192) * s))) AS es FROM pop),
        |sigs AS (SELECT media_id, CAST(list_sum(list_transform(range(64), b ->
        |    CASE WHEN es[CAST(b AS INT) + 2] > es[CAST(b AS INT) + 1] THEN
        |      CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << CAST(b AS INT)) END
        |    ELSE 0 END)) AS BIGINT) AS fp FROM e)
        |SELECT a.media_id AS a_id, b.media_id AS b_id,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin))(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"),
          (lit(500) + pmod(col("doc_id"), lit(257))).as("n"),
          lit(16000).as("sr"))
        val base = Multimodal.encodeWavPcmQuiet(docs, "doc_id", "n", "sr",
          scale = 1)
        val loud = Multimodal.encodeWavPcmQuiet(
            docs.filter(pmod(col("doc_id"), lit(5)) === 0),
            "doc_id", "n", "sr", scale = 2)
          .withColumn("media_id", col("media_id") + 10000)
        Multimodal.audioNearDupPairs(base.unionByName(loud),
          windowFrames = 7, maxHamming = 3, bands = 4)
      }),

    // content-defined chunking (Rabin-style CDC): boundary wherever the
    // 8-byte window hash has 4 zero low bits (expected 16-byte chunks);
    // stateless predicate = shift-invariant AND engine-replayable. Chunks
    // close by lead() over boundary rows — no per-doc array assembly.
    Q("q_cdc_chunks", Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS blen FROM documents),
        |bd AS (SELECT doc_id, unnest(list_filter(range(8, blen),
        |    p -> ('0x' || substring(md5(substring(hx, ((p - 8) * 2 + 1)::BIGINT, 16)), 1, 15))::BIGINT % 16 = 0)) AS p
        |  FROM b WHERE blen > 8),
        |st AS (SELECT doc_id, 0 AS p FROM b UNION ALL SELECT doc_id, p::INT AS p FROM bd),
        |ch AS (SELECT st.doc_id, p,
        |    row_number() OVER w - 1 AS chunk_no,
        |    lead(p, 1, blen) OVER w AS e, hx
        |  FROM st JOIN b USING (doc_id)
        |  WINDOW w AS (PARTITION BY st.doc_id ORDER BY p))
        |SELECT doc_id, chunk_no, CAST(p AS BIGINT) AS start,
        |  CAST(e - p AS BIGINT) AS chunk_len,
        |  md5(substring(hx, (p * 2 + 1)::BIGINT, ((e - p) * 2)::BIGINT)) AS chunk_md5
        |FROM ch""".stripMargin))(
      (s, d) =>
        Multimodal.cdcChunks(media(s, d), windowBytes = 8, maskBits = 4)
          .select(col("media_id").as("doc_id"), col("chunk_no"),
            col("start"), col("chunk_len"), col("chunk_md5"))),

    // cross-document chunk dedup: the store-each-block-once inventory —
    // identical byte runs dedup even at different offsets (that's the
    // CDC property; a fixed-grid chunker would miss shifted copies)
    Q("q_cdc_dedup", Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS blen FROM documents),
        |bd AS (SELECT doc_id, unnest(list_filter(range(8, blen),
        |    p -> ('0x' || substring(md5(substring(hx, ((p - 8) * 2 + 1)::BIGINT, 16)), 1, 15))::BIGINT % 16 = 0)) AS p
        |  FROM b WHERE blen > 8),
        |st AS (SELECT doc_id, 0 AS p FROM b UNION ALL SELECT doc_id, p::INT AS p FROM bd),
        |ch AS (SELECT st.doc_id, p, lead(p, 1, blen) OVER w AS e, hx
        |  FROM st JOIN b USING (doc_id)
        |  WINDOW w AS (PARTITION BY st.doc_id ORDER BY p))
        |SELECT md5(substring(hx, (p * 2 + 1)::BIGINT, ((e - p) * 2)::BIGINT)) AS chunk_md5,
        |  CAST(e - p AS BIGINT) AS chunk_len, count(*) AS n_copies,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_media
        |FROM ch GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin))(
      (s, d) =>
        Multimodal.cdcDedup(
          Multimodal.cdcChunks(media(s, d), windowBytes = 8, maskBits = 4))),

    // perceptual 64-bit dHash over REAL ImageIO decodes of deterministic
    // BMP payloads — the oracle recomputes the whole chain in closed
    // form (pixel values, integer 9×8 box sums, cross-multiplied mean
    // comparisons, signed bit packing), so the hash matches iff the
    // codec + downscale + comparator reproduce every pixel decision.
    Q("q_image_dhash", Some(
      """WITH p AS (SELECT doc_id, 9 + doc_id % 24 AS w, 8 + doc_id % 16 AS h
        |  FROM documents),
        |c AS (SELECT doc_id, w, h,
        |  list_transform(range(72), c -> {
        |    's': list_sum(flatten(list_transform(range((c // 9) * h // 8, (c // 9 + 1) * h // 8), y ->
        |          list_transform(range((c % 9) * w // 9, (c % 9 + 1) * w // 9), x ->
        |            (doc_id * 31 + y * w + x) * 7 % 256)))),
        |    'n': ((c // 9 + 1) * h // 8 - (c // 9) * h // 8) * ((c % 9 + 1) * w // 9 - (c % 9) * w // 9)
        |  }) AS cells FROM p),
        |b AS (SELECT doc_id, w, h,
        |  list_transform(range(64), b ->
        |    CASE WHEN cells[(b // 8) * 9 + (b % 8) + 2]['s'] * cells[(b // 8) * 9 + (b % 8) + 1]['n']
        |            > cells[(b // 8) * 9 + (b % 8) + 1]['s'] * cells[(b // 8) * 9 + (b % 8) + 2]['n']
        |      THEN 1 ELSE 0 END) AS bits FROM c)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(list_sum(list_transform(range(64), i ->
        |    CASE WHEN bits[CAST(i AS INT) + 1] = 1 THEN
        |      CASE WHEN i = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << CAST(i AS INT)) END
        |    ELSE 0 END)) AS BIGINT) AS dhash
        |FROM b""".stripMargin))(
      (s, d) =>
        Multimodal.imageDHash(Multimodal.encodeBmpGray(
            t(s, d, "documents").select(col("doc_id"),
              (lit(9) + pmod(col("doc_id"), lit(24))).as("w"),
              (lit(8) + pmod(col("doc_id"), lit(16))).as("h")),
            "doc_id", "w", "h")).toDF()
          .select(col("media_id").as("doc_id"), col("width"),
            col("height"), col("dhash"))),

    // image near-dup over a corpus with PLANTED duplicates the byte
    // layer cannot see: every 5th image re-encoded as PNG (identical
    // pixels, unrelated bytes → Hamming 0) and every 7th re-sized 2×
    // (pixel-replicated upscale → Hamming small). Banded 4×16-bit
    // candidates + exact verify ≡ the oracle's brute-force O(n²) pair
    // join by pigeonhole (3 < 4 bands). The oracle re-derives every
    // signature closed-form across all three populations.
    Q("q_image_neardup", Some(
      """WITH docs AS (SELECT doc_id, 9 + doc_id % 24 AS w, 8 + doc_id % 16 AS h
        |  FROM documents),
        |pop AS (
        |  SELECT doc_id AS media_id, doc_id AS seed, w, h, 1 AS s FROM docs
        |  UNION ALL
        |  SELECT doc_id + 10000, doc_id, w, h, 1 FROM docs WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000, doc_id, w, h, 2 FROM docs WHERE doc_id % 7 = 0),
        |c AS (SELECT media_id,
        |  list_transform(range(72), c -> {
        |    's': list_sum(flatten(list_transform(range((c // 9) * (h * s) // 8, (c // 9 + 1) * (h * s) // 8), y ->
        |          list_transform(range((c % 9) * (w * s) // 9, (c % 9 + 1) * (w * s) // 9), x ->
        |            (seed * 31 + (y // s) * w + (x // s)) * 7 % 256)))),
        |    'n': ((c // 9 + 1) * (h * s) // 8 - (c // 9) * (h * s) // 8) * ((c % 9 + 1) * (w * s) // 9 - (c % 9) * (w * s) // 9)
        |  }) AS cells FROM pop),
        |b AS (SELECT media_id,
        |  list_transform(range(64), b ->
        |    CASE WHEN cells[(b // 8) * 9 + (b % 8) + 2]['s'] * cells[(b // 8) * 9 + (b % 8) + 1]['n']
        |            > cells[(b // 8) * 9 + (b % 8) + 1]['s'] * cells[(b // 8) * 9 + (b % 8) + 2]['n']
        |      THEN 1 ELSE 0 END) AS bits FROM c),
        |sigs AS (SELECT media_id, CAST(list_sum(list_transform(range(64), i ->
        |    CASE WHEN bits[CAST(i AS INT) + 1] = 1 THEN
        |      CASE WHEN i = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << CAST(i AS INT)) END
        |    ELSE 0 END)) AS BIGINT) AS dhash FROM b)
        |SELECT a.media_id AS a_id, b.media_id AS b_id,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin))(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"),
          (lit(9) + pmod(col("doc_id"), lit(24))).as("w"),
          (lit(8) + pmod(col("doc_id"), lit(16))).as("h"))
        val base = Multimodal.encodeBmpGray(docs, "doc_id", "w", "h")
        val png = Multimodal.encodePngGray(
            docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "w", "h")
          .withColumn("media_id", col("media_id") + 10000)
        val resized = Multimodal.encodeBmpGrayScaled(
            docs.filter(pmod(col("doc_id"), lit(7)) === 0),
            "doc_id", "w", "h", scale = 2)
          .withColumn("media_id", col("media_id") + 20000)
        Multimodal.imageNearDupPairs(
          base.unionByName(png).unionByName(resized),
          maxHamming = 3, bands = 4)
      }),
  )
}
