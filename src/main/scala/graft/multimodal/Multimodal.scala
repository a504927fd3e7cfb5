package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing (builder brief): media are opaque `binary` payloads
  * with typed metadata; decode/feature-extraction runs as batched
  * per-partition Scala code (the JVM analogue of `mapInPandas` — rows are
  * processed in fixed-size batches exactly as a vectorized decode would
  * hand frames to a native library).
  *
  * The actual image decode is STUBBED — no media libraries ship in this
  * environment — behind [[Multimodal.decodeImageStub]], a deterministic
  * fake that derives "pixels" from the payload bytes. Everything around
  * the stub (schema, binary column handling, batch shape, partition
  * parallelism, feature schema) is real and tested.
  *
  * Scale notes: payloads never pass through a shuffle — features are
  * extracted in the scan stage (narrow mapPartitions), and only the small
  * numeric feature rows flow downstream. At 100 TB that is the difference
  * between shuffling media bytes and shuffling ~40 B/row.
  */
object Multimodal {
  /** Batch size handed to the (stubbed) vectorized decoder. */
  val DECODE_BATCH = 64

  case class MmRecord(doc_id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int)
  case class MmFeature(doc_id: Long, payload_len: Long, byte_sum: Long,
      n_frames: Long)

  /** STUB: stands in for a real image decoder (e.g. libjpeg via JNI).
    * Deterministically expands payload bytes into a fake w*h "pixel"
    * buffer so downstream feature code has realistic shapes to chew on. */
  def decodeImageStub(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](width * height)
    var i = 0
    while (i < out.length) {
      out(i) = if (payload.isEmpty) 0 else payload(i % payload.length)
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize over a (stub-)decoded pixel buffer — the
    * resize math is real; only the pixels are fake. */
  def resizeStub(pixels: Array[Byte], w: Int, h: Int,
      newW: Int, newH: Int): Array[Byte] = {
    require(pixels.length == w * h, s"pixel buffer ${pixels.length} != $w x $h")
    val out = new Array[Byte](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y.toLong * h / newH
      var x = 0
      while (x < newW) {
        val sx = x.toLong * w / newW
        out(y * newW + x) = pixels((sy * w + sx).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * frame, deterministic. Mirrors how a real sampler would slice a
    * container's frame stream. */
  def frameSampleStub(payload: Array[Byte], frameSize: Int,
      stride: Int): Seq[Array[Byte]] = {
    require(frameSize > 0 && stride > 0)
    val nFrames = payload.length / frameSize
    (0 until nFrames by stride).map { f =>
      java.util.Arrays.copyOfRange(payload, f * frameSize, (f + 1) * frameSize)
    }
  }

  /** One decoder batch -> feature rows. Features are defined on the raw
    * payload (length, byte sum, frame-sample count) so they are exactly
    * reproducible by the oracle; the stub decode is still exercised to
    * keep the batch plumbing honest. */
  def extractBatch(batch: Seq[MmRecord]): Iterator[MmFeature] = {
    batch.iterator.map { r =>
      val pixels = decodeImageStub(r.payload, r.width, r.height)
      require(pixels.length == r.width * r.height, "stub decode shape")
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      MmFeature(r.doc_id, r.payload.length.toLong, sum,
        r.payload.length.toLong / 32 + 1)
    }
  }

  case class MmPipelineRow(doc_id: Long, rs_sum: Long, n_frames_total: Long,
      n_sampled: Long, first_frame_sum: Long)

  /** Full media pipeline over one batch: stub-decode -> 8x8 nearest-
    * neighbor resize (checksummed) -> frame sampling (32-byte frames,
    * stride 4). The resize/sampling INDEX MATH is real and
    * oracle-replayable; only the pixels are payload-derived fakes. */
  def pipelineBatch(batch: Seq[MmRecord]): Iterator[MmPipelineRow] = {
    batch.iterator.map { r =>
      val pixels = decodeImageStub(r.payload, r.width, r.height)
      val rs = resizeStub(pixels, r.width, r.height, 8, 8)
      var rsSum = 0L
      var i = 0
      while (i < rs.length) { rsSum += rs(i) & 0xff; i += 1 }
      val frames = frameSampleStub(r.payload, frameSize = 32, stride = 4)
      val firstSum = frames.headOption.map { f =>
        var s = 0L; var j = 0
        while (j < f.length) { s += f(j) & 0xff; j += 1 }
        s
      }.getOrElse(0L)
      MmPipelineRow(r.doc_id, rsSum, (r.payload.length / 32).toLong,
        frames.length.toLong, firstSum)
    }
  }

  /** The batched decode->resize->frame-sample pass as a DataFrame. */
  def pipeline(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    attachPayload(docs).as[MmRecord]
      .mapPartitions(_.grouped(DECODE_BATCH).flatMap(pipelineBatch))
      .toDF()
  }

  /** documents -> (doc_id, modality, payload BINARY, width, height):
    * the text bytes stand in for media payloads; metadata is derived
    * deterministically.
    *
    * ASCII invariant, asserted in-line (ADVICE r8): the engine side of
    * the multimodal queries samples payload BYTES while their DuckDB
    * oracles sample CODEPOINTS over len(text) characters — equal only
    * while the corpus is pure ASCII (byte count == char count and byte
    * values == codepoints). A corpus change that introduces non-ASCII
    * must fail HERE loudly, not as a silent oracle hash mismatch.
    * Sampled (1 doc in 101) so the guard costs nothing at scale; the
    * raise_error lives INSIDE the payload expression so column pruning
    * can never drop it while payload is consumed. */
  def attachPayload(docs: DataFrame): DataFrame = {
    val asciiOk = col("doc_id") % 101 =!= 0 ||
      length(col("text")) === expr("octet_length(text)")
    docs.select(col("doc_id"), lit("image").as("modality"),
      when(asciiOk, col("text").cast("binary"))
        .otherwise(raise_error(concat(
          lit("multimodal ASCII invariant violated (bytes != chars) at doc_id="),
          col("doc_id").cast("string")))).as("payload"),
      (col("doc_id") % 64 + 1).cast("int").as("width"),
      (col("doc_id") % 48 + 1).cast("int").as("height"))
  }

  /** The batched feature-extraction pass. */
  def features(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    attachPayload(docs).as[MmRecord]
      .mapPartitions(_.grouped(DECODE_BATCH).flatMap(extractBatch))
      .toDF()
  }

  case class MmPhash(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Perceptual-hash proxy over the stub decode, FIXED-GEOMETRY so that
    * alike payloads hash alike regardless of doc metadata: 16x16 stub
    * decode -> 8x8 nearest-neighbor resize (rs[p] = payload[(2*(p/8)*16
    * + 2*(p%8)) mod len] — pure index math the oracle replays from the
    * bytes), bit p set iff 64*rs[p] > sum(rs) (mean threshold with no
    * division), packed as four 16-bit LSH bands. A real pHash swaps the
    * stub decode for a DCT over real pixels; everything downstream —
    * banding, candidate join, Hamming verify — is unchanged. */
  def phashBatch(batch: Seq[MmRecord]): Iterator[MmPhash] = {
    batch.iterator.map { r =>
      val pixels = decodeImageStub(r.payload, 16, 16)
      val rs = resizeStub(pixels, 16, 16, 8, 8)
      var tot = 0L
      var i = 0
      while (i < 64) { tot += rs(i) & 0xff; i += 1 }
      val bands = new Array[Long](4)
      i = 0
      while (i < 64) {
        if (64L * (rs(i) & 0xff) > tot) bands(i / 16) |= 1L << (i % 16)
        i += 1
      }
      MmPhash(r.doc_id, bands(0), bands(1), bands(2), bands(3))
    }
  }

  /** The batched perceptual-hash pass: (doc_id, b0..b3). */
  def phash(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    attachPayload(docs).as[MmRecord]
      .mapPartitions(_.grouped(DECODE_BATCH).flatMap(phashBatch))
      .toDF()
  }

  case class MmAudio(doc_id: Long, n_samples: Long, n_windows: Long,
      energy_total: Long, energy_max: Long, n_zero_cross: Long)

  /** Audio feature extraction over the stub "PCM": payload bytes as
    * centered 8-bit samples (byte − 64 — the ASCII corpus's midpoint, so
    * the fake signal actually crosses zero), short-time ENERGY over
    * 64-sample windows at hop 32 (the 50%-overlap window/hop walk every
    * STFT front-end runs — the overlapping-window shape image frames and
    * video strides don't exercise) plus a whole-signal zero-crossing
    * count. Window/hop index math and the feature sums are real and
    * oracle-replayable; only the samples are payload-derived fakes (a
    * real pipeline swaps in PCM from a decoder and adds an FFT per
    * window — same batch plumbing, same shuffle profile: payloads stay
    * in the scan stage, 5 longs per doc flow downstream). */
  def audioBatch(batch: Seq[MmRecord]): Iterator[MmAudio] = {
    val win = 64
    val hop = 32
    batch.iterator.map { r =>
      val n = r.payload.length
      def sample(i: Int): Long = (r.payload(i) & 0xff).toLong - 64L
      val nWin = if (n >= win) (n - win) / hop + 1 else 0
      var total = 0L
      var emax = 0L
      var w = 0
      while (w < nWin) {
        var e = 0L
        var i = 0
        while (i < win) {
          val sv = sample(w * hop + i)
          e += sv * sv
          i += 1
        }
        total += e
        if (e > emax) emax = e
        w += 1
      }
      var zc = 0L
      var i = 1
      while (i < n) {
        if ((sample(i - 1) < 0) != (sample(i) < 0)) zc += 1
        i += 1
      }
      MmAudio(r.doc_id, n.toLong, nWin.toLong, total, emax, zc)
    }
  }

  /** The batched audio-feature pass. */
  def audio(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    attachPayload(docs).as[MmRecord]
      .mapPartitions(_.grouped(DECODE_BATCH).flatMap(audioBatch))
      .toDF()
  }
}
