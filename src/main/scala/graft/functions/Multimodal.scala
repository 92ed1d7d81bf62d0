package graft.functions

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, decoded batch-wise in executors.
  *
  * The decode itself is STUBBED (no image/audio codec libraries in this
  * container): `StubImageDecoder` derives deterministic fake dimensions
  * from the first bytes. Everything Spark-side is real — the binary
  * column schema, the typed Dataset, the mapPartitions batch shape (one
  * decoder instance per partition, streaming iterator, no per-row
  * setup) — so swapping in a real codec is a one-class change.
  *
  * mapPartitions deliberately breaks whole-stage codegen here: the decode
  * is opaque foreign code, the exact case (d) in the build-plan's
  * custom-operator preference order.
  */
case class MediaRecord(doc_id: Long, content: Array[Byte], media_type: String)

case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int)

trait MediaDecoder extends Serializable {
  /** Returns (width, height) of the decoded media. */
  def decode(content: Array[Byte]): (Int, Int)
}

/** Deterministic stand-in for a real image decoder. */
object StubImageDecoder extends MediaDecoder {
  def decode(c: Array[Byte]): (Int, Int) = (
    if (c.length > 0) c(0) & 0xff else 0,
    if (c.length > 1) c(1) & 0xff else 0)
}

object Multimodal {
  def decodeMeta(ds: Dataset[MediaRecord],
      decoder: MediaDecoder): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h) = decoder.decode(r.content)
        MediaMeta(r.doc_id, r.media_type, r.content.length, w, h)
      }
    }
  }
}
