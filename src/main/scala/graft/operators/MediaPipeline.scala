package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batch media-processing plumbing: opaque binary payloads run through a
  * pluggable decoder inside `mapPartitions`, the Scala-Spark analogue of a
  * pandas-batch UDF: per-partition setup/teardown amortized across rows,
  * output as typed columns.
  *
  * Every gated query runs a REAL decoder: [[PgmDecoder]] (dependency-free
  * binary-PGM parse — header, payload validation, pixel reduction),
  * [[PgmQuadDecoder]] (the pooled-feature descriptor over the same parse),
  * and the multi-frame container walk ([[frameIndex]], concatenated P5
  * images — the netpbm multi-image stream convention) behind `mm_frames`'
  * sample-then-decode. The container has no JPEG/ffmpeg, so PGM is the
  * codec; a production decoder drops in through the same [[Decoder]] seam.
  * The distributed plumbing — schema, per-partition decoder lifecycle,
  * batch shape, deterministic frame sampling — is real and tested
  * (MediaPipelineSpec).
  */
object MediaPipeline {

  /** Decoded media metadata + a fixed-length feature vector. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
      height: Int, n_frames: Int, features: Array[Float])

  /** Exact-integer value routed through a Float feature slot: floats
    * represent every integer with |v| ≤ 2²⁴ exactly; beyond that the
    * conversion rounds and the "bit-exact oracle replay" claim silently
    * breaks. Decoders pass every integer-sum feature through this so an
    * out-of-domain payload fails LOUDLY instead of hashing wrong (any
    * fixture-sized raster/clip is orders of magnitude below the bound). */
  def exactFloat(v: Long, what: String): Float = {
    // explicit two-sided bound, NOT math.abs: abs(Long.MinValue) is
    // negative, which would slip the one value the guard exists to catch
    require(v <= (1L << 24) && v >= -(1L << 24),
      s"$what=$v exceeds the float-exact integer domain (2^24); " +
        "widen the feature slot to Double before trusting this value")
    v.toFloat
  }

  /** The seam where a real codec (JPEG/PNG/ffmpeg) plugs in. Implementations
    * must be deterministic per byte payload.
    *
    * STATEFUL decoders (native contexts opened in open()) must be CLASSES,
    * never Scala `object`s: a class instance captured in the closure
    * deserializes fresh per task, giving each partition its own lifecycle,
    * while an `object` resolves to the one JVM singleton on
    * deserialization — under local[N] or multi-core executors, concurrent
    * tasks would interleave open()/close() on shared state (task A's
    * completion listener frees the context while task B is mid-decode).
    * The shipped `object` decoders are safe only because they are
    * stateless. */
  trait Decoder extends Serializable {
    /** Called once per partition before any decode — open native contexts. */
    def open(): Unit = ()
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float])
    /** Called once per partition after the last decode. */
    def close(): Unit = ()
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

  /** One frame located inside a multi-frame payload: byte offset of its
    * header, parsed dimensions, and the offset of its first pixel byte. */
  case class FrameRef(offset: Long, w: Int, h: Int, pixStart: Int)

  /** Walk a multi-frame payload (concatenated binary-PGM images — the
    * netpbm multi-image stream convention) and index every frame by
    * sequential REAL header parses: each frame's pixel length positions the
    * next header. Loud failure on any malformed frame; an empty payload has
    * zero frames. This is the container-demux step of a video pipeline —
    * the sampler below decodes only the frames it keeps. */
  def frameIndex(payload: Array[Byte]): IndexedSeq[FrameRef] = {
    val out = IndexedSeq.newBuilder[FrameRef]
    var pos = 0
    while (pos < payload.length) {
      val (w, h, pixStart) = PgmDecoder.parseFrameHeaderAt(payload, pos)
      // Long arithmetic: a malformed header like 65536x65536 wraps w*h to 0
      // in Int, which would pass the truncation guard and desync the walk
      val px = w.toLong * h.toLong
      require(px <= (payload.length.toLong - pixStart) && px <= Int.MaxValue,
        s"frameIndex: truncated frame at byte $pos (${w}x$h)")
      out += FrameRef(pos.toLong, w, h, pixStart)
      pos = pixStart + px.toInt
    }
    out.result()
  }

  /** Evenly-spaced sample of `k` frame indices from `nFrames`
    * (floor(i·n/k), the classic stride sample): deterministic, strictly
    * increasing for k ≤ n, always in range. */
  def sampleIndices(nFrames: Int, k: Int): Seq[Int] =
    if (nFrames <= 0 || k <= 0) Seq.empty
    else (0 until k).map(i => ((i.toLong * nFrames) / k).toInt)

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
    /** Parse the P5 header and validate the raster fills the payload
      * exactly: (width, height, offset of the first pixel byte). Loud
      * failure on any malformation. */
    def parseHeader(payload: Array[Byte]): (Int, Int, Int) = {
      val (w, h, pos) = parseFrameHeaderAt(payload, 0)
      // Long product: Int w*h wraps for adversarial headers (65536x65536)
      require(payload.length.toLong - pos == w.toLong * h.toLong,
        s"PgmDecoder: ${payload.length - pos} pixel bytes for ${w}x$h")
      (w, h, pos)
    }

    /** Parse one P5 header starting at `start`, tolerating trailing bytes
      * (the next frame of a multi-image stream): (width, height, offset of
      * the first pixel byte). */
    def parseFrameHeaderAt(payload: Array[Byte], start: Int): (Int, Int, Int) = {
      var pos = start
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
      (w, h, 1, Array(exactFloat(sum, "pgm pixel sum"),
        mn.toFloat, mx.toFloat))
    }
  }

  /** Encode a minimal canonical PCM WAV file: RIFF/WAVE header, one `fmt `
    * chunk (PCM, mono, 16-bit), one `data` chunk of little-endian signed
    * samples. 44 header bytes — the layout every audio tool writes. */
  def wavPayload(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(16)             // fmt chunk size
    bb.putShort(1)            // PCM
    bb.putShort(1)            // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2)            // block align
    bb.putShort(16)           // bits per sample
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** A REAL audio decoder through the same [[Decoder]] seam: parses the
    * RIFF/WAVE container (chunk walk — `fmt ` validated as 16-bit mono
    * PCM, `data` located by id, unknown chunks skipped by their declared
    * size, loud failure on malformation), then reduces the signed samples
    * to exact integer features (sum, min, max). Returns (sampleRate,
    * nSamples, 1, features) through the (w, h, frames, feats) slots. */
  object WavDecoder extends Decoder {
    /** Walk the RIFF chunks: (sampleRate, offset of first data byte,
      * nSamples). */
    def parseHeader(payload: Array[Byte]): (Int, Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(off: Int, n: Int) =
        new String(payload, off, n, java.nio.charset.StandardCharsets.US_ASCII)
      require(payload.length >= 44, s"WavDecoder: ${payload.length} bytes")
      require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
        "WavDecoder: not a RIFF/WAVE container")
      require(bb.getInt(4) == payload.length - 8,
        s"WavDecoder: RIFF size ${bb.getInt(4)} for ${payload.length} bytes")
      var pos = 12
      var rate = -1
      var dataOff = -1
      var dataLen = -1
      while (pos + 8 <= payload.length && (rate < 0 || dataOff < 0)) {
        val id = ascii(pos, 4)
        val sz = bb.getInt(pos + 4)
        require(sz >= 0 && pos + 8 + sz <= payload.length,
          s"WavDecoder: chunk '$id' of $sz bytes overruns the payload")
        if (id == "fmt ") {
          require(sz >= 16, s"WavDecoder: fmt chunk of $sz bytes")
          require(bb.getShort(pos + 8) == 1, "WavDecoder: not PCM")
          require(bb.getShort(pos + 10) == 1, "WavDecoder: not mono")
          require(bb.getShort(pos + 22) == 16, "WavDecoder: not 16-bit")
          rate = bb.getInt(pos + 12)
          require(rate > 0, s"WavDecoder: sample rate $rate")
        } else if (id == "data") {
          require(rate > 0, "WavDecoder: data chunk before fmt")
          require(sz % 2 == 0, s"WavDecoder: odd data length $sz")
          dataOff = pos + 8
          dataLen = sz
        }
        pos += 8 + sz + (sz & 1) // RIFF pads odd chunks
      }
      require(rate > 0 && dataOff >= 0, "WavDecoder: missing fmt /data chunk")
      (rate, dataOff, dataLen / 2)
    }

    override def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val (rate, dataOff, n) = parseHeader(payload)
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var i = 0
      while (i < n) {
        val v: Int = bb.getShort(dataOff + 2 * i)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      if (n == 0) { mn = 0; mx = 0 }
      (rate, n, 1, Array(exactFloat(sum, "wav sample sum"),
        mn.toFloat, mx.toFloat))
    }
  }

  /** Nearest-sample decimation of a parsed WAV payload by an integer
    * `factor`: keep every factor-th sample (indices ≡ 0 mod factor) and
    * divide the clock to match — the zero-filter downsample (a production
    * resampler adds an anti-alias filter in front of the same indexing),
    * bit-deterministic and replayable by an index-arithmetic oracle.
    * Returns (decimated rate, kept samples). */
  def decimateWav(payload: Array[Byte], factor: Int): (Int, Array[Short]) = {
    require(factor >= 1, s"decimateWav: factor $factor")
    val (rate, dataOff, n) = WavDecoder.parseHeader(payload)
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n2 = if (n == 0) 0 else (n + factor - 1) / factor
    val out = new Array[Short](n2)
    var i = 0
    while (i < n2) {
      out(i) = bb.getShort(dataOff + 2 * i * factor)
      i += 1
    }
    (rate / factor, out)
  }

  /** Feature EXTRACTION through the same real parse: 2×2 average-pool
    * quadrant pixel sums (split at ⌈h/2⌉ rows / ⌈w/2⌉ cols — top-left,
    * top-right, bottom-left, bottom-right), the pooled spatial descriptor a
    * vision pipeline computes after decode. Sums are exact as floats: a
    * quadrant holds < 2¹⁶ pixels of ≤255 at any fixture size « 2²⁴. */
  object PgmQuadDecoder extends Decoder {
    override def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val (w, h, pos) = PgmDecoder.parseHeader(payload)
      val hTop = (h + 1) / 2
      val wLeft = (w + 1) / 2
      val q = new Array[Long](4)
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val v = payload(pos + r * w + c) & 0xff
          q((if (r < hTop) 0 else 2) + (if (c < wLeft) 0 else 1)) += v
          c += 1
        }
        r += 1
      }
      (w, h, 1, q.map(exactFloat(_, "pgm quadrant sum")))
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
