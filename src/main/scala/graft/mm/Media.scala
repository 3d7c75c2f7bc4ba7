package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing — schema, batch shape, partition preservation —
  * is real and tested. The DECODE KERNELS ARE DETERMINISTIC STUBS:
  * this container ships no image/audio codecs, so `decodeStub` derives
  * pixels from the payload bytes directly. A production build replaces
  * [[MediaKernels.decodeStub]] with a JNI/Pandas-UDF codec; every
  * surrounding operator is unchanged.
  */
object Media {

  /** Deterministic fake media attached to documents: payload bytes are a
    * pure function of (doc_id, text) — stands in for real fetched bytes.
    */
  def attach(docs: DataFrame, kind: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit(kind).as("kind"),
      // payload: the utf8 text bytes, our stand-in blob
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(xxhash64(col("text")), lit(64)) + 16).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(64)) + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10).cast("int").as("duration_ms")).as("meta"))

  /** Feature extraction over the binary column, batched per partition the
    * way a vectorized (Pandas-style) UDF would be. Output: fixed-size
    * float feature vector per media item. Partitioning is preserved
    * (narrow op).
    */
  def features(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media
      .mapPartitions { rows =>
        // batch shape: process in fixed-size chunks like a vectorized UDF
        rows.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(idIdx)
            val bytes = r.getAs[Array[Byte]](payloadIdx)
            (id, MediaKernels.decodeStub(bytes, dim))
          }
        }
      }
      .toDF("media_id", "feature")
  }

  /** Frame sampling for video-ish payloads: split the payload into
    * fixed-stride "frames", keep every `everyNth`, one output row per kept
    * frame — a generator (row-multiplying) op done with posexplode.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
                   everyNth: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("payload")) / frameBytes).cast("int")
    media
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(0), greatest(nFrames - 1, lit(0))))
          .as(Seq("frame_idx", "frame_no")))
      .where(pmod(col("frame_idx"), lit(everyNth)) === 0)
      .select(col("media_id"), col("frame_idx"),
        substring(col("payload"), col("frame_idx") * frameBytes + 1,
                  lit(frameBytes)).as("frame_bytes"))
  }
}

object MediaKernels {
  /** STUB DECODE ??? — deterministic fake: treats payload bytes as gray
    * pixels and emits `dim` block means. Replace with a real codec
    * (JNI/opencv or a Pandas UDF over mapInArrow) in production; the
    * signature (bytes → fixed-dim float vector) is the contract.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    val block = math.max(1, bytes.length / dim)
    var d = 0
    while (d < dim) {
      var s = 0L; var n = 0
      var i = d * block
      while (i < math.min(bytes.length, (d + 1) * block)) {
        s += (bytes(i) & 0xff); n += 1; i += 1
      }
      out(d) = if (n == 0) 0f else s.toFloat / n
      d += 1
    }
    out
  }
}
