package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal columns: image/audio/video payloads ride as opaque
  * `binary` columns next to relational ones; decode / feature-extract
  * runs as a per-partition batch pipeline (`mapPartitions`), which is
  * where a real deployment hands batches to a native codec or an
  * inference runtime. The container has no media codecs, so
  * [[Multimodal.decodeStub]] is a clearly-marked deterministic FAKE —
  * the Spark-side plumbing (schema, typed Dataset, partition-batched
  * UDF shape, feature schema) is real and tested.
  */
case class MediaRow(doc_id: Long, payload: Array[Byte])

case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                         mean_byte: Double)

object Multimodal {

  /** STUB decoder. A real implementation would invoke an image codec
    * here (e.g. JPEG decode → dimensions); none ships in this
    * environment, so dimensions are derived deterministically from the
    * payload hash to keep the pipeline testable end-to-end.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    (64 + math.floorMod(h, 64), 64 + math.floorMod(h >> 6, 64))
  }

  /** Partition-batched feature extraction over the binary column. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // One iterator per partition: amortizes any per-batch setup a real
      // decoder needs (codec contexts, model sessions, pinned buffers).
      it.map { m =>
        val (w, h) = decodeStub(m.payload)
        var sum = 0L
        var i = 0
        while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
        val mean = if (m.payload.length == 0) 0.0 else sum.toDouble / m.payload.length
        MediaFeatures(m.doc_id, m.payload.length, w, h, mean)
      }
    }(Encoders.product[MediaFeatures])

  def extractFeaturesDF(df: DataFrame): DataFrame =
    extractFeatures(df.as[MediaRow](Encoders.product[MediaRow])).toDF()
}
