package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — training-data pipeline surface.
  *
  * Images / audio / video ride through the engine as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample are per-row transformations. The REAL Spark
  * decisions — schema, batch shape, partition sizing so one partition of
  * blobs fits executor memory, and keeping blob bytes OUT of shuffles
  * (operate, then project metadata before any wide stage) — are all here
  * and tested. Image decode is REAL ([[ImageIoCodec]], `javax.imageio`
  * from the JDK — header-only width/height/channels for PNG/JPEG/GIF/BMP,
  * gated against generated PNG fixtures by q_multimodal_decode); formats
  * the JDK cannot read fall back to the deterministic [[StubCodec]]
  * arithmetic, and a video/audio decoder swaps in behind the same
  * [[BlobCodec]] seam inside `mapPartitions` without touching any schema
  * or caller.
  */
object Multimodal {

  /** Wrap a corpus into the multimodal shape: (id, blob binary, meta
    * struct). Here the blob is the UTF-8 of the text column — stand-in for
    * real image bytes with identical plumbing. */
  def asBlobTable(docs: DataFrame, id: String, payload: String): DataFrame =
    docs.select(col(id).as("id"),
      col(payload).cast("binary").as("blob"),
      struct(
        length(col(payload).cast("binary")).cast("long").as("n_bytes"),
        sha2(col(payload).cast("binary"), 256).as("sha256"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** STUB decoder: derives fake image dimensions deterministically from
    * the byte length. A real decoder replaces exactly this expression with
    * a per-partition codec call; every downstream column is unchanged. */
  def decodeStub(blob: Column): Column = {
    val n = length(blob).cast("long")
    struct(
      (lit(64L) + pmod(n, lit(577L))).as("width"),
      (lit(64L) + pmod(n, lit(417L))).as("height"),
      lit(3L).as("channels"),
      (lit(1L) + pmod(n, lit(30L))).as("n_frames"))
  }

  /** Decode + resize metadata: clamp the longer side to `maxSide`
    * preserving aspect ratio (integer math, deterministic). */
  def withDecodedMeta(blobs: DataFrame, maxSide: Int = 224): DataFrame = {
    val d = decodeStub(col("blob"))
    blobs.withColumn("decoded", d)
      .withColumn("resize_scale",
        least(lit(1.0),
          lit(maxSide.toDouble) /
            greatest(col("decoded.width"), col("decoded.height"))))
      .withColumn("out_width",
        floor(col("decoded.width") * col("resize_scale")).cast("long"))
      .withColumn("out_height",
        floor(col("decoded.height") * col("resize_scale")).cast("long"))
  }

  /** Frame sampling: `k` evenly-spaced byte slices of the blob (stand-in
    * for video frame extraction; same explode shape a real sampler has —
    * one output row per frame, blob bytes never shuffled because the slice
    * happens before the explode projects them away). */
  def sampleFrames(blobs: DataFrame, k: Int, frameBytes: Int = 16)
      : DataFrame =
    blobs.where(col("meta.n_bytes") >= frameBytes)
      .select(col("id"), col("blob"),
        explode(expr(
          s"""transform(sequence(0, ${k - 1}), f -> named_struct(
             |  'frame', CAST(f AS BIGINT),
             |  'offset', CAST(f * ((meta.n_bytes - $frameBytes)
             |     DIV ${math.max(k - 1, 1)}) AS BIGINT)))""".stripMargin))
          .as("fr"))
      .select(col("id"), col("fr.frame").as("frame"),
        col("fr.offset").as("offset"),
        expr(s"sha2(substring(blob, CAST(fr.offset + 1 AS INT), $frameBytes)"
          + ", 256)").as("frame_sha256"))

  /** Feature-extraction stub: fixed-width feature vector from blob bytes
    * (xxhash64 of byte slices folded to [0,1]) — the real extractor swaps
    * in at the same column position with the same `Array[Double]` type. */
  def featureStub(blob: Column, dim: Int = 8): Column =
    expr(s"""transform(sequence(0, ${dim - 1}), j ->
      |  CAST(pmod(xxhash64(substring(blob, j * 8 + 1, 16)), 10000L)
      |    AS DOUBLE) / 10000.0)""".stripMargin)

  final case class Decoded(id: Long, width: Long, height: Long,
                           channels: Long, n_frames: Long)

  /** The codec seam for [[decodePartitioned]]: ONE instance per
    * partition, so a decoder's expensive init (reader lookup, JNI/FFI
    * library load, GPU context) is paid partitions-times, not
    * rows-times. Implementations return (width, height, channels,
    * n_frames). */
  trait BlobCodec extends Serializable {
    def decode(blob: Array[Byte]): (Long, Long, Long, Long)
  }

  /** Deterministic fake reproducing [[decodeStub]]'s arithmetic exactly,
    * so the expression path and the partition path are testable against
    * each other — and the fallback for formats [[ImageIoCodec]] cannot
    * read. */
  class StubCodec extends BlobCodec {
    def decode(blob: Array[Byte]): (Long, Long, Long, Long) = {
      val n = blob.length.toLong
      (64L + n % 577L, 64L + n % 417L, 3L, 1L + n % 30L)
    }
  }

  /** REAL image decode via `javax.imageio` (in the JDK — zero new
    * dependencies): PNG / JPEG / GIF / BMP headers are read through the
    * registered `ImageReader`s. Width/height come from the header
    * (`reader.getWidth(0)`), NOT a full pixel decode — the scalable path
    * for metadata extraction over binary columns; channels from the
    * declared image type; n_frames from `getNumImages` (multi-frame
    * GIFs). Blobs no reader recognizes (the magic bytes match no
    * registered format) fall back to [[StubCodec]]'s arithmetic, keeping
    * the seam total. `ImageIO.setUseCache(false)` keeps the readers
    * in-memory — no per-row temp files on executors. */
  class ImageIoCodec extends BlobCodec {
    import javax.imageio.ImageIO
    ImageIO.setUseCache(false)
    private val stub = new StubCodec

    def decode(blob: Array[Byte]): (Long, Long, Long, Long) = {
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) stub.decode(blob)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val channels = {
              val types = r.getImageTypes(0)
              if (types.hasNext) types.next().getNumBands.toLong else 3L
            }
            val frames = try {
              val n = r.getNumImages(true)
              if (n > 0) n.toLong else 1L
            } catch { case _: java.io.IOException => 1L }
            (r.getWidth(0).toLong, r.getHeight(0).toLong, channels, frames)
          } finally r.dispose()
        }
      } catch {
        case _: java.io.IOException => stub.decode(blob)
      } finally iis.close()
    }
  }

  /** REAL audio header decode via `javax.sound.sampled` (in the JDK —
    * zero new dependencies): WAV / AIFF / AU headers are read through
    * `AudioSystem.getAudioFileFormat`, which parses the container header
    * only — never the sample data — the scalable path for audio metadata
    * over binary columns. The [[BlobCodec]] quad maps to audio as
    * (sample_rate, bits_per_sample, channels, n_frames); blobs no
    * provider recognizes fall back to [[StubCodec]]'s arithmetic,
    * keeping the seam total. Stream-marked so the format reader never
    * copies the byte array. */
  class WavCodec extends BlobCodec {
    private val stub = new StubCodec

    def decode(blob: Array[Byte]): (Long, Long, Long, Long) = {
      try {
        val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(blob))
        val af = fmt.getFormat
        (af.getSampleRate.round.toLong,
          af.getSampleSizeInBits.toLong,
          af.getChannels.toLong,
          fmt.getFrameLength.toLong)
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          stub.decode(blob)
        case _: java.io.IOException => stub.decode(blob)
      }
    }
  }

  /** Deterministic WAV fixture table: one REAL 16-bit PCM WAV per input
    * id — `8000 + 1000·(id mod 8)` Hz, `1 + id mod 2` channels,
    * `128 + id mod 256` frames — encoded per partition with
    * `javax.sound.sampled`. The audio twin of [[syntheticPngTable]]:
    * dims are pure id arithmetic any SQL engine can predict, while the
    * bytes are genuine RIFF/WAVE containers only a real audio stack can
    * read. */
  def syntheticWavTable(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      it.map { i =>
        val rate = (8000 + 1000 * math.floorMod(i, 8L)).toInt
        val channels = (1 + math.floorMod(i, 2L)).toInt
        val frames = (128 + math.floorMod(i, 256L)).toInt
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val pcm = new Array[Byte](frames * fmt.getFrameSize)
        var j = 0
        while (j < pcm.length) { // deterministic non-silent content
          pcm(j) = ((i + j) % 251).toByte
          j += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (i, bos.toByteArray)
      }
    }.toDF("id", "blob")
  }

  /** Deterministic PNG fixture table: one REAL `(64 + id mod 97) ×
    * (64 + id mod 53)` 3-channel PNG per input id, encoded per partition
    * with `javax.imageio`. Exists so the real-decode path has an
    * oracle-checkable gate: the decoded dimensions are pure id
    * arithmetic any SQL engine can predict, while the bytes themselves
    * are genuine PNGs only a real codec can read. */
  def syntheticPngTable(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { i =>
        val w = (64 + math.floorMod(i, 97L)).toInt
        val h = (64 + math.floorMod(i, 53L)).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        // cheap deterministic content so the PNGs are not all-black
        img.setRGB(math.floorMod(i, w.toLong).toInt,
          math.floorMod(i, h.toLong).toInt, 0xffffff)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (i, bos.toByteArray)
      }
    }.toDF("id", "blob")
  }

  /** Per-partition decode path (the brief's `mapInPandas` shape in its
    * Scala form): iterator-in/iterator-out `mapPartitions`, so rows
    * stream through the codec without materializing a partition, and the
    * blob bytes are projected away in the SAME stage — nothing wide ever
    * carries them. Schema and row shape are identical to consuming
    * [[withDecodedMeta]]'s `decoded` struct. Default codec is the REAL
    * [[ImageIoCodec]] (header-only javax.imageio decode with stub
    * fallback for unrecognized formats). */
  def decodePartitioned(blobs: DataFrame,
                        codec: () => BlobCodec = () => new ImageIoCodec)
      : DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val c = codec() // per-partition init point
        it.map { case (id, b) =>
          val (w, h, ch, f) = c.decode(b)
          Decoded(id, w, h, ch, f)
        }
      }
      .toDF()
  }
}
