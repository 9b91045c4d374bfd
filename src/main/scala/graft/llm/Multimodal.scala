package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are carried as
  * opaque `binary` columns with a typed metadata struct, and feature
  * extraction runs batched per partition — the shape a real decoder (JNI
  * image lib, ffmpeg bindings, …) plugs into.
  *
  * The decode step itself is a STUB (this container has no media libraries):
  * [[StubCodec.decode]] derives a deterministic fake "feature vector" from
  * the bytes. Everything around it — the schema, the binary column, the
  * partition-level batching via mapPartitions, the Dataset encoders — is the
  * real 100 TB-shaped plumbing: payload bytes never hit the driver, and each
  * executor core streams its partition through the codec.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      payload: Array[Byte],
  )

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float],
  )

  /** STUB codec — stands in for a real image/audio decoder. Deterministic:
    * derives pseudo-features from payload bytes only. */
  object StubCodec {
    val featureDim = 8
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      // ??? <- a real implementation would decode the container format here.
      // Deterministic fake: "dimensions" from the first bytes, features from
      // a rolling byte sum — stable across runs and engines.
      val w = if (payload.isEmpty) 0 else (payload(0) & 0x7f) + 1
      val h = if (payload.length < 2) 0 else (payload(1) & 0x7f) + 1
      val feat = new Array[Float](featureDim)
      var acc = 0L
      var i = 0
      while (i < payload.length) {
        acc = acc * 31 + (payload(i) & 0xff)
        feat(i % featureDim) += ((acc % 1000).toFloat / 1000.0f)
        i += 1
      }
      (w, h, feat)
    }
  }

  /** documents -> media table: text payload re-encoded as UTF-8 binary with
    * typed metadata. In production this column is the raw image/audio bytes
    * read straight from parquet/object storage. */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      length(col("text")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"),
    )

  /** Batched per-partition feature extraction. mapPartitions (not a per-row
    * UDF) so a real codec can amortize init cost per partition — the Scala
    * analog of `mapInPandas` batch shape. */
  def features(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] = media.as[MediaRecord]
    ds.mapPartitions { it =>
      // per-partition codec init would go here (once per task, not per row)
      it.map { m =>
        val (w, h, feat) = StubCodec.decode(m.payload)
        MediaFeatures(m.media_id, m.mime, m.n_bytes, w, h, feat)
      }
    }.toDF()
  }

  /** Deterministic frame-sampling analog: every `stride`-th byte of the
    * payload as a "frame", limited to `maxFrames` — the access pattern a
    * video frame-sampler has (seek + slice), kept executor-side. */
  def sampleFrames(media: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    media.select(
      col("media_id"),
      expr(
        s"""transform(sequence(0, least(int(n_bytes / $stride), ${maxFrames - 1})),
           |  i -> substring(payload, i * $stride + 1, 1))""".stripMargin).as("frames"),
    )

  /** Deterministic resize analog: downsample the payload to `targetBytes`
    * by taking evenly strided bytes (a nearest-neighbor-resize access
    * pattern — seek + gather, per row, executor-side; a real image resize
    * plugs into the same column shape). Payloads at or under the target
    * pass through; metadata (`n_bytes`) tracks the new size. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame =
    media
      .withColumn("payload",
        when(col("n_bytes") <= targetBytes, col("payload"))
          .otherwise(expr(
            s"""aggregate(
               |  transform(sequence(0, ${targetBytes - 1}),
               |    i -> substring(payload, int(i * n_bytes / $targetBytes) + 1, 1)),
               |  cast(X'' as binary), (acc, b) -> concat(acc, b))""".stripMargin)))
      .withColumn("n_bytes", least(col("n_bytes"), lit(targetBytes.toLong)))
}
