package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns + typed metadata, processed
  * per-partition through a pluggable decoder. The Spark-side design is
  * the real deliverable at 100 TB:
  *  - payloads never pass through a shuffle (decode → features happens
  *    map-side, features are small, the binary column is dropped before
  *    any wide stage);
  *  - decoding is batched per partition (one decoder instance per task,
  *    amortized init — same shape as mapInPandas batching in PySpark);
  *  - the decoder is a trait so the container's missing image/audio libs
  *    are STUBBED with [[DeterministicFakeDecoder]] — the schema,
  *    partitioning and batch plumbing are real and tested, the codec is
  *    swapped in production. The stub now covers ONLY H.264 and
  *    perceptual audio codecs (MP3/AAC) — formats that genuinely need
  *    native libraries. Progressive JPEG decodes for real in BOTH
  *    modes ([[MediaCodec.decodeJpegProgressive]]): spectral
  *    selection (gated `mm_jpeg_prog`: multi-scan coefficient
  *    accumulation, EOBRUN runs) and successive-approximation
  *    refinement (gated `mm_jpeg_refine`: Ah>0 correction-bit scans
  *    per T.81 G.1.2), plus G.711 µ-law, the telephony standard
  *    ([[MediaCodec.decodeWavUlaw]], gated `mm_wav_ulaw`), decode for
  *    real: BMP/PNG/GIF/JPEG and
  *    RIFF/WAV container headers parse for real in [[MediaCodec]]
  *    (pure JVM, gated by a round-trip oracle), and FIVE formats
  *    decode CONTENT for real: baseline JPEG in grayscale, 4:4:4
  *    color, and the wild-web 4:2:0 subsampled layout
  *    ([[MediaCodec.decodeJpegPixels]]/[[MediaCodec.decodeJpegRgb]] —
  *    file-read Huffman tables, MCU-interleaved entropy decode with
  *    per-component sampling factors, dequant, real 8×8 IDCT,
  *    replication chroma upsampling, fixed-point YCbCr→RGB — gated by
  *    `mm_jpeg_pixels` / `mm_jpeg_rgb` / `mm_jpeg_420`), 24-bpp BMP
  *    pixels
  *    ([[MediaCodec.decodeBmpPixels]] — BGR order, row padding,
  *    bottom-up/top-down layout — gated by `mm_bmp_pixels`), truecolor
  *    PNG pixels ([[MediaCodec.decodePngPixels]] — CRC-checked chunk
  *    walk, multi-IDAT inflate, all five scanline filters — gated by
  *    `mm_png_pixels`), indexed GIF pixels
  *    ([[MediaCodec.decodeGifPixels]] — real variable-width LZW,
  *    extension-block walk, palette read from the file — gated by
  *    `mm_gif_pixels`) and 16-bit PCM WAV samples
  *    ([[MediaCodec.decodeWavSamples]] — interleaved little-endian
  *    int16, chunk-walked data offset — gated by `mm_wav_samples`).
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(id: Long, kind: String, byteLen: Int,
                                 width: Int, height: Int, nFrames: Int,
                                 featureHash: Long)

  /** Per-partition decoder: one instance per task. */
  trait MediaDecoder extends Serializable {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** Deterministic stand-in for the real codec (image/audio libs are not
    * in this container). Features are pure functions of the payload so
    * tests and oracles are exact: width/height derive from byte length,
    * frame count models a 30fps clip, featureHash is a rolling
    * polynomial hash of the bytes (the "embedding"). */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val n = r.payload.length
        var h = 1125899906842597L // rolling hash, deterministic
        var i = 0
        while (i < n) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.id, r.kind, n,
          width = 64 + (n % 448),
          height = 64 + ((n * 7) % 448),
          nFrames = if (r.kind == "video") 1 + n % 30 else 1,
          featureHash = h)
      }
  }

  /** binary+metadata → per-item features, decoder batched per partition.
    * The partition count is the decode parallelism knob: at scale,
    * repartition upstream so each task holds a codec-friendly batch. */
  def extractFeatures(media: Dataset[MediaRow],
                      decoder: MediaDecoder = DeterministicFakeDecoder)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => decoder.decode(rows))
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame —
    * metadata-only, no decode (the planner stage of a two-pass pipeline).
    */
  def sampleFramePlan(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    // fail on the driver, not as a task-time sequence-step error
    require(stride > 0, s"stride must be positive, got $stride")
    import features.sparkSession.implicits._
    features.filter(_.kind == "video").toDF()
      .select(col("id"), col("nFrames"),
        sequence(lit(0), col("nFrames") - 1, lit(stride)).as("frameIdx"))
  }

  /** Audio STFT window plan: frame/hop window start offsets over 16-bit
    * PCM payloads (n_samples = byteLen / 2) — the planner stage before
    * any spectrogram decode, metadata-only like [[sampleFramePlan]].
    * Payloads too short for one full frame yield no rows. */
  def audioWindowPlan(features: Dataset[MediaFeatures], frame: Int,
                      hop: Int): DataFrame = {
    require(frame > 0 && hop > 0 && hop <= frame,
      s"need 0 < hop <= frame, got frame=$frame hop=$hop")
    import features.sparkSession.implicits._
    features.filter(_.kind == "audio").toDF()
      .select(col("id"), (col("byteLen") / 2).cast("int").as("n_samples"))
      .filter(col("n_samples") >= frame)
      .select(col("id"), col("n_samples"),
        explode(sequence(lit(0),
          floor((col("n_samples") - frame) / hop).cast("int"))).as("win_idx"))
      .select(col("id"), col("n_samples"), col("win_idx").cast("int").as("win_idx"),
        (col("win_idx") * hop).cast("int").as("start_sample"))
  }

  /** Fixture adapter: synthesize a media table from `documents` (text
    * bytes as payload) so the plumbing runs against the driver fixtures. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"),
      // deterministic kind assignment: image/audio/video round-robin
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
