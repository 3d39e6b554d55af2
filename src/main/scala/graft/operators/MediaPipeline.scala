package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batch media-processing plumbing: opaque binary payloads run through a
  * pluggable decoder inside `mapPartitions`, the Scala-Spark analogue of a
  * pandas-batch UDF: per-partition setup/teardown amortized across rows,
  * output as typed columns.
  *
  * Two decoders ship: [[FakeDecoder]], a hash stub standing in for codecs
  * the container doesn't have (JPEG/ffmpeg), and [[PgmDecoder]], a REAL
  * dependency-free binary-PGM parser proving the seam end-to-end — header
  * parse, payload validation, pixel reduction (gated by `mm_decode`). The
  * distributed plumbing — schema, per-partition decoder lifecycle, batch
  * shape, deterministic frame sampling — is real and tested
  * (MediaPipelineSpec).
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

  /** Encode a binary PGM (netpbm P5) image: `"P5 <w> <h> 255\n"` + raw
    * 8-bit pixel rows. The one raster format simple enough to carry no
    * dependency yet real enough to have a parseable header and a defined
    * on-disk pixel layout. */
  def pgmPayload(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h,
      s"pgmPayload: ${pixels.length} pixels for ${w}x$h")
    s"P5 $w $h 255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      pixels
  }

  /** A REAL decoder through the [[Decoder]] seam — not the hash fake: parses
    * the binary-PGM header (magic, ASCII dimensions, maxval, single
    * whitespace terminator), validates the pixel payload length, and reduces
    * the raster to (sum, min, max) features over the unsigned pixel values.
    * Exercises exactly the contract a JPEG/ffmpeg decoder would plug into:
    * bytes in, dimensions + per-image features out, loud failure on a
    * malformed payload. Feature floats are exact: sums are ≤ 255·w·h « 2²⁴
    * at the fixture sizes. */
  object PgmDecoder extends Decoder {
    /** Parse the P5 header and validate the raster: (width, height, offset
      * of the first pixel byte). Loud failure on any malformation. */
    def parseHeader(payload: Array[Byte]): (Int, Int, Int) = {
      var pos = 0
      def readToken(): String = {
        while (pos < payload.length && payload(pos).toChar.isWhitespace)
          pos += 1
        val start = pos
        while (pos < payload.length && !payload(pos).toChar.isWhitespace)
          pos += 1
        require(pos > start, s"PgmDecoder: truncated header at byte $start")
        new String(payload, start, pos - start,
          java.nio.charset.StandardCharsets.US_ASCII)
      }
      val magic = readToken()
      require(magic == "P5", s"PgmDecoder: bad magic '$magic'")
      val w = readToken().toInt
      val h = readToken().toInt
      val maxval = readToken().toInt
      require(w > 0 && h > 0, s"PgmDecoder: bad dimensions ${w}x$h")
      require(maxval == 255, s"PgmDecoder: unsupported maxval $maxval")
      pos += 1 // the single whitespace byte terminating the header
      require(payload.length - pos == w * h,
        s"PgmDecoder: ${payload.length - pos} pixel bytes for ${w}x$h")
      (w, h, pos)
    }

    override def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val (w, h, pos) = parseHeader(payload)
      var sum = 0L
      var mn = 256
      var mx = -1
      var i = pos
      while (i < payload.length) {
        val v = payload(i) & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      (w, h, 1, Array(sum.toFloat, mn.toFloat, mx.toFloat))
    }
  }

  /** Nearest-neighbor downsample of a parsed PGM raster by an integer
    * `factor`: keep the pixel at the top-left of each factor×factor cell
    * (rows/cols ≡ 0 mod factor), so output dims are ⌈w/f⌉×⌈h/f⌉ — the
    * classic zero-interpolation resize, bit-deterministic and replayable by
    * an index-arithmetic oracle. Returns (w2, h2, resized pixels). */
  def resizeNearest(payload: Array[Byte], factor: Int): (Int, Int, Array[Byte]) = {
    require(factor >= 1, s"resizeNearest: factor $factor")
    val (w, h, pos) = PgmDecoder.parseHeader(payload)
    val w2 = (w + factor - 1) / factor
    val h2 = (h + factor - 1) / factor
    val out = new Array[Byte](w2 * h2)
    var r = 0
    while (r < h2) {
      var c = 0
      while (c < w2) {
        out(r * w2 + c) = payload(pos + (r * factor) * w + c * factor)
        c += 1
      }
      r += 1
    }
    (w2, h2, out)
  }
}
