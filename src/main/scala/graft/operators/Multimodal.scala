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
  * and tested. The codec itself is STUBBED with a deterministic fake
  * (`decodeStub`): this container has no image/audio libs; swap the stub
  * for a JNI/FFI decoder inside `mapPartitions` (Scala) or `mapInPandas`
  * (PySpark) without touching any schema or caller.
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
    * partition, so a real decoder's expensive native init (JNI/FFI
    * library load, GPU context) is paid partitions-times, not rows-times.
    * This fake reproduces [[decodeStub]]'s arithmetic exactly so the
    * expression path and the partition path are testable against each
    * other; a real implementation replaces only this class. */
  class StubCodec extends Serializable {
    def decode(blob: Array[Byte]): (Long, Long, Long, Long) = {
      val n = blob.length.toLong
      (64L + n % 577L, 64L + n % 417L, 3L, 1L + n % 30L)
    }
  }

  /** Per-partition decode path (the brief's `mapInPandas` shape in its
    * Scala form): iterator-in/iterator-out `mapPartitions`, so rows
    * stream through the codec without materializing a partition, and the
    * blob bytes are projected away in the SAME stage — nothing wide ever
    * carries them. Schema and row shape are identical to consuming
    * [[withDecodedMeta]]'s `decoded` struct. */
  def decodePartitioned(blobs: DataFrame,
                        codec: () => StubCodec = () => new StubCodec)
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
