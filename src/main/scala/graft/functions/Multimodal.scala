package graft.functions

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, length}

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, decoded batch-wise in executors.
  *
  * The decode itself is STUBBED (no image/audio codec libraries in this
  * container): `StubImageDecoder` derives deterministic fake dimensions
  * from the first bytes, `resize` truncates the byte buffer, and
  * `extractFeatures` histograms raw bytes. Everything Spark-side is real
  * — the binary column schema, the typed Dataset, the mapPartitions
  * batch shape (one decoder instance per partition, streaming iterator,
  * no per-row setup), the 1→N frame generator, and the size-balanced
  * repartitioning — so swapping in a real codec is a one-class change.
  *
  * mapPartitions deliberately breaks whole-stage codegen here: the decode
  * is opaque foreign code, the exact case (d) in the build-plan's
  * custom-operator preference order.
  */
case class MediaRecord(doc_id: Long, content: Array[Byte], media_type: String)

case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int)

/** One sampled frame of a (fake) video/audio buffer. */
case class FrameRecord(doc_id: Long, frame_id: Int, offset: Int,
    frame: Array[Byte])

/** Byte-histogram features — the stub stand-in for an image embedding.
  * Fractions are exact small-int/n doubles, rounded on a fixed grid so
  * engines agree bit-for-bit. */
case class MediaFeatures(doc_id: Long, f_space: Double, f_low: Double,
    f_high: Double, n_bytes: Int)

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

  /** Frame sampling (the video path): every `stride` bytes emit a
    * `frameLen`-byte frame, at most `maxFrames` per document — a 1→N
    * generator in the same batched mapPartitions shape as decode. The
    * real-codec swap seeks keyframes instead of slicing bytes; row
    * schema and fan-out semantics stay identical. */
  def sampleFrames(ds: Dataset[MediaRecord], frameLen: Int, stride: Int,
      maxFrames: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        Iterator.range(0, maxFrames)
          .takeWhile(i => i * stride < r.content.length)
          .map { i =>
            val off = i * stride
            val end = math.min(off + frameLen, r.content.length)
            FrameRecord(r.doc_id, i, off,
              java.util.Arrays.copyOfRange(r.content, off, end))
          }
      }
    }
  }

  /** Stub "resize": truncate the buffer to targetW×targetH bytes (a real
    * codec decodes, scales, re-encodes — same signature). */
  def resize(ds: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    val cap = targetW * targetH
    ds.mapPartitions { it =>
      it.map { r =>
        if (r.content.length <= cap) r
        else r.copy(content = java.util.Arrays.copyOf(r.content, cap))
      }
    }
  }

  /** Stub feature extraction (the image-embedding path): normalized
    * byte-class histogram. Real swap: codec decode + model forward pass
    * per batch; the per-partition batching is the part that matters. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    def frac(k: Int, n: Int): Double =
      BigDecimal(k.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    ds.mapPartitions { it =>
      it.map { r =>
        val n = r.content.length
        var sp = 0; var lo = 0; var hi = 0
        r.content.foreach { b =>
          ((b & 0xff) / 16) match {
            case 2 => sp += 1
            case 6 => lo += 1
            case 7 => hi += 1
            case _ => ()
          }
        }
        MediaFeatures(r.doc_id, frac(sp, n), frac(lo, n), frac(hi, n), n)
      }
    }
  }

  /** Decode-cost balancing: media blobs are wildly size-skewed (a 4 K
    * video next to an icon); range-partitioning by byte length gives
    * each executor a comparable decode budget instead of whatever the
    * scan's file split happened to contain. */
  def balanceBySize(ds: Dataset[MediaRecord],
      numPartitions: Int): Dataset[MediaRecord] =
    ds.repartitionByRange(numPartitions, length(col("content")))
}
