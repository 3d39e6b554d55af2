package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batch media-processing plumbing: opaque binary payloads run through a
  * pluggable decoder inside `mapPartitions`, the Scala-Spark analogue of a
  * pandas-batch UDF: per-partition setup/teardown amortized across rows,
  * output as typed columns.
  *
  * The actual byte→pixels/samples step is STUBBED (`FakeDecoder`) because the
  * container ships no codec libraries; the distributed plumbing — schema,
  * per-partition decoder lifecycle, batch shape, deterministic frame
  * sampling — is real and tested (MediaPipelineSpec).
  */
object MediaPipeline {

  /** Decoded media metadata + a fixed-length feature vector. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
      height: Int, n_frames: Int, features: Array[Float])

  /** The seam where a real codec (JPEG/PNG/ffmpeg) plugs in. Implementations
    * must be deterministic per byte payload. */
  trait Decoder extends Serializable {
    /** Called once per partition before any decode — open native contexts. */
    def open(): Unit = ()
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float])
    /** Called once per partition after the last decode. */
    def close(): Unit = ()
  }

  /** ??? in spirit: a deterministic fake standing in for a real codec.
    * Dimensions and features derive only from payload bytes, so results are
    * partitioning-invariant. */
  object FakeDecoder extends Decoder {
    override def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      var h = 1469598103934665603L // FNV-1a offset basis, 64-bit
      payload.foreach { b => h ^= (b & 0xffL); h *= 1099511628211L }
      val w = 16 + java.lang.Long.remainderUnsigned(h, 1280L).toInt
      val ht = 16 + java.lang.Long.remainderUnsigned(h >>> 17, 720L).toInt
      val nf = 1 + java.lang.Long.remainderUnsigned(h >>> 31, 8L).toInt
      val feats = Array.tabulate(8) { i =>
        (java.lang.Long.remainderUnsigned(h >>> i, 1000L).toFloat / 1000f)
      }
      (w, ht, nf, feats)
    }
  }

  /** payload column (binary) + id column → decoded features, one decoder
    * lifecycle per partition. close() runs exactly once, via the task
    * completion listener — an iterator-side close would double-fire on
    * repeated end-of-iterator hasNext() calls and never fire at all when a
    * limit/take (or task failure) abandons the iterator mid-partition. */
  def decodeAll(df: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        decoder.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; decoder.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        it.map { case (id, payload) =>
          val (w, h, nf, feats) = decoder.decode(payload)
          MediaFeatures(id, payload.length.toLong, w, h, nf, feats)
        }
      }
  }

  /** Deterministic frame-sample offsets for a payload: evenly-spaced strides,
    * the shape a real video sampler would produce. Offsets are always within
    * the payload — when nFrames exceeds byteLen the sample is truncated
    * rather than pointing a reader past the end. */
  def frameOffsets(byteLen: Long, nFrames: Int): Seq[Long] =
    if (byteLen <= 0 || nFrames <= 0) Seq.empty
    else {
      val stride = math.max(byteLen / nFrames, 1L)
      (0 until nFrames).map(_ * stride).filter(_ < byteLen)
    }
}
