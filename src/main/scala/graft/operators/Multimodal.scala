package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary + typed metadata,
  * decode/feature-extract as per-partition batch transforms.
  *
  * All three modalities decode through REAL zero-dependency JDK codecs —
  * image via `javax.imageio` PNG ([[imageStats]]/m08), audio via
  * `javax.sound.sampled` WAV ([[audioStats]]/m09), video via the
  * `javax.imageio` animated-GIF sequence reader ([[videoFrameStats]]/m10)
  * — each formula-oracled end-to-end. [[FakeCodec]] remains only as the
  * seam's test-double for arbitrary non-container payloads; a production
  * JNI/FFM codec (JPEG/MP4) slots into the same factory argument and
  * changes no plumbing.
  */
object Multimodal {

  final case class MediaItem(doc_id: Long, media: Array[Byte], mime: String)

  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      byte_len: Long,
      width: Long,
      height: Long,
      frames: Long)

  /** The per-partition decode seam: every media transform instantiates ONE
    * codec per partition (codec init is expensive in real decoders; never
    * per-row) and maps rows through it. Implementations must be
    * constructible on executors (the FACTORY crosses the closure, not the
    * codec — real codecs hold native/heavy state that must never
    * serialize).
    */
  trait MediaCodec extends Serializable {
    def decode(m: MediaItem): MediaFeatures
    def close(): Unit = ()
  }

  /** Spread the HEAVY synthetic-media generators' doc stream across the
    * cluster before the codec kernels (r21, guide §2.5 "input skew: one
    * huge unsplittable file ... repartition immediately after the read"):
    * the documents table at bench SFs is ONE small parquet split, so
    * without this every javax.imageio encode+decode — the dominant cost of
    * the GIF/PNG queries — ran serially in a single task while the other
    * cores idled. Hash-partition on the deterministic doc_id (retry-safe,
    * never a rand-derived key — guide §2.5) into defaultParallelism
    * partitions, which follows the cluster/core count instead of a tuned
    * constant. Cost: one shuffle of 8-byte ids, orders of magnitude below
    * the imageio work it parallelizes. Applied ONLY to the imageio-backed
    * generators (GIF sequence, PNG): the WAV/byte-stream generators are so
    * cheap per row that the extra exchange measured SLOWER than the serial
    * pass (m09 0.89s -> 2.84s, m13 0.68s -> 1.61s at sf0.1), so those keep
    * the narrow single-pass shape. A 100 TB media table arrives already
    * multi-split, where this is a near-no-op rebalance of the id stream.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** TEST-DOUBLE (no longer the default path): deterministic fake decoder
    * for exercising the seam with arbitrary non-container payloads — it
    * derives "dimensions" from the payload so outputs stay verifiable
    * end-to-end without a decodable container. Real decodes go through
    * [[ImageIoCodec]] (image — the default), [[audioStats]] (WAV) and
    * [[videoFrameStats]] (animated GIF).
    */
  final class FakeCodec extends MediaCodec {
    def decode(m: MediaItem): MediaFeatures = {
      val n = m.media.length.toLong
      MediaFeatures(m.doc_id, m.mime, n, n % 640L, (n * 7L) % 480L, n / 100L)
    }
  }

  /** REAL codec: decodes the payload with the JDK's built-in `javax.imageio`
    * readers (PNG/BMP/GIF — no external dependency, works headless). The
    * m05 claim demonstrated: swapping this for [[FakeCodec]] changes only
    * the factory argument — the mapPartitions plumbing, schema, and
    * partitioning are untouched (MultimodalSpec pins it; m08 oracles the
    * decoded pixels against the generating formula, which only a REAL
    * lossless decode can satisfy).
    */
  final class ImageIoCodec extends MediaCodec {
    // in-memory decode path: the default disk-backed ImageIO cache writes a
    // temp file PER IMAGE — measurable at 50k images/partition-set, pure
    // waste for byte-array sources (JVM-global flag, idempotent)
    javax.imageio.ImageIO.setUseCache(false)
    def decode(m: MediaItem): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
      if (img == null) // undecodable payload -> poison row, the p06 convention
        MediaFeatures(m.doc_id, m.mime, m.media.length.toLong, -1L, -1L, 0L)
      else
        MediaFeatures(m.doc_id, m.mime, m.media.length.toLong,
          img.getWidth.toLong, img.getHeight.toLong, 1L)
    }
  }

  /** Decode + feature-extract with one codec instance per partition. The
    * default factory is the REAL `javax.imageio` decoder; pass
    * `() => new FakeCodec` (or any [[MediaCodec]]) to swap in the
    * test-double — the plan is identical either way (MultimodalSpec pins
    * the swap changes zero plan code).
    */
  def extractFeatures(ds: Dataset[MediaItem],
      codecFactory: () => MediaCodec = () => new ImageIoCodec): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = codecFactory()
      it.map(codec.decode)
    }
  }

  /** Exact per-image channel statistics through a REAL decode: width,
    * height, and integer channel sums/maxima over the decoded RGB pixels.
    * One [[ImageIoCodec]]-style reader per partition; all outputs are
    * exact integers, so a first-principles oracle over the pixel formula
    * verifies the decode end-to-end (PNG is lossless).
    */
  final case class ImageStats(
      doc_id: Long, width: Long, height: Long, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, max_lum3: Long)

  def imageStats(ds: Dataset[MediaItem]): Dataset[ImageStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // one reader pipeline per partition (the codec-per-partition seam);
      // in-memory decode — no per-image temp file (see ImageIoCodec)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
        if (img == null) {
          // undecodable payload → poison row (the p06 convention, matching
          // ImageIoCodec): degrade the row, never NPE the task
          ImageStats(m.doc_id, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
        } else {
        var (sr, sg, sb, ml) = (0L, 0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sr += r; sg += g; sb += b
            val l3 = (r + g + b).toLong // 3x luminance stays integer
            if (l3 > ml) ml = l3
            x += 1
          }
          y += 1
        }
        ImageStats(m.doc_id, img.getWidth.toLong, img.getHeight.toLong,
          img.getWidth.toLong * img.getHeight, sr, sg, sb, ml)
        }
      }
    }
  }

  /** Synthesize a deterministic PNG per document — the m08 fixture path:
    * geometry and every pixel derive from doc_id alone (the formula below
    * is the oracle's ground truth), ENCODED with the real `javax.imageio`
    * PNG writer on the executors. Decoding these back (imageStats) must
    * reproduce the formula exactly because PNG is lossless — which is what
    * makes a no-image-library DuckDB oracle possible for a real codec.
    * Geometry: w = 8 + doc_id % 8, h = 8 + (doc_id * 3) % 8; pixel
    * channels: r = (7 doc + 31 x + 13 y) % 256, g = (11 doc + 17 x + 29 y)
    * % 256, b = (5 doc + 23 x + 19 y) % 256.
    */
  def pngImagesFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id"))).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no per-image temp files
      it.map { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + (id * 3) % 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((7 * id + 31 * x + 13 * y) % 256).toInt
            val g = ((11 * id + 17 * x + 29 * y) % 256).toInt
            val b = ((5 * id + 23 * x + 19 * y) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaItem(id, bos.toByteArray, "image/png")
      }
    }
  }

  final case class FrameSample(doc_id: Long, frame_idx: Long, phash: Long)

  final case class ResizedMedia(
      doc_id: Long, width: Long, height: Long, out_w: Long, out_h: Long)

  /** Resize plan: fit each item's (width, height) into a `maxW` x `maxH` box
    * preserving aspect ratio (integer arithmetic — floor division — so the
    * plan is engine-exact). The real pixel work happens in the partition
    * codec like [[extractFeatures]]; computing target geometry is pure
    * column math and stays in codegen.
    */
  def resizePlan(features: Dataset[MediaFeatures], maxW: Long, maxH: Long): Dataset[ResizedMedia] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val (w, h) = (math.max(f.width, 1L), math.max(f.height, 1L))
      val scaleNum = math.min(maxW * h, maxH * w) // compare maxW/w vs maxH/h
      val (ow, oh) =
        if (w <= maxW && h <= maxH) (w, h)
        else (scaleNum / h, scaleNum / w) // floor((min scale) * dim)
      ResizedMedia(f.doc_id, f.width, f.height, ow, oh)
    }
  }

  /** Frame sampling: every `step`-th frame of each media item, with a
    * deterministic perceptual-hash stand-in per frame (test-double decode
    * for arbitrary payloads — [[videoFrameStats]] is the REAL-container
    * twin for frame statistics and [[videoFrameDHash]] the REAL perceptual
    * hash the near-dup path consumes, so this stand-in survives only as
    * the plumbing test-double). Real codecs seek per keyframe; the
    * plumbing shape — typed flatMap, one codec per partition, bounded
    * output per item — is the production one.
    */
  def sampleFrames(ds: Dataset[MediaItem], step: Int = 3): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      val n = m.media.length.toLong
      val frames = n / 100L
      (0L until frames by step.toLong).map { idx =>
        FrameSample(m.doc_id, idx, (n * 131L + idx * 7L) % 2147483647L)
      }
    }
  }

  final case class AudioTrim(
      doc_id: Long,
      n_frames: Long,
      n_silent: Long,
      first_keep: Long,
      last_keep: Long,
      kept_frames: Long)

  /** Audio silence-trim plan: the media payload read as PCM-ish frames of
    * `frameLen` bytes (last frame may be partial), per-frame energy = sum
    * of unsigned byte values, a frame is SILENT when its energy falls
    * below `threshold`, and the trim keeps [first, last] non-silent
    * frames (the leading/trailing-silence cut every speech pipeline runs
    * before feature extraction). The energy computation stands in for a
    * real decoder (same STUB contract as [[extractFeatures]]: swap the
    * byte-sum for decoded PCM RMS and nothing else changes); the typed
    * mapPartitions shape — one codec per partition, bounded per-item
    * output, exact integer energies — is the production plumbing.
    * first_keep/last_keep are -1 when every frame is silent.
    */
  def audioTrimPlan(ds: Dataset[MediaItem], frameLen: Int = 64,
      threshold: Long = 6000L): Dataset[AudioTrim] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new FakeCodec
      val _ = codec // real impl: codec.decodePcm(m)
      it.map { m =>
        val n = m.media.length
        val nFrames = (n + frameLen - 1) / frameLen
        var first = -1L; var last = -1L; var silent = 0L
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var i = f * frameLen
          val end = math.min(i + frameLen, n)
          while (i < end) { e += (m.media(i) & 0xff).toLong; i += 1 }
          if (e < threshold) silent += 1
          else { if (first < 0) first = f.toLong; last = f.toLong }
          f += 1
        }
        AudioTrim(m.doc_id, nFrames.toLong, silent, first, last,
          if (first < 0) 0L else last - first + 1L)
      }
    }
  }

  final case class MediaEnergy(doc_id: Long, n_bytes: Long, energy: Long)

  /** Per-item total signal energy through the stub codec path (one codec
    * per partition like [[extractFeatures]]): the fake "energy" is the
    * unsigned byte sum — a real impl swaps in decoded-PCM/pixel RMS and no
    * plumbing changes. Exact integers, so shard-level drift rollups (m07)
    * cross engines without a float in sight.
    */
  def energyStats(ds: Dataset[MediaItem]): Dataset[MediaEnergy] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new FakeCodec
      val _ = codec // real impl: codec.decodePcm(m) / decode pixels
      it.map { m =>
        var e = 0L
        var i = 0
        while (i < m.media.length) { e += (m.media(i) & 0xff).toLong; i += 1 }
        MediaEnergy(m.doc_id, m.media.length.toLong, e)
      }
    }
  }

  /** Synthesize a deterministic 16-bit mono PCM WAV per document — the m09
    * fixture path, the audio twin of [[pngImagesFromDocuments]]: sample
    * count and every sample derive from doc_id alone (the formula below is
    * the oracle's ground truth), wrapped in a hand-built RIFF/WAVE header.
    * Samples: n = 64 + doc_id % 64; s(i) = (31 doc + 17 i) % 65536 − 32768,
    * little-endian.
    */
  def wavFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = (64 + id % 64).toInt
      val dataLen = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(1.toShort) // mono
        .putInt(8000).putInt(8000 * 2) // sample rate, byte rate
        .putShort(2.toShort).putShort(16.toShort) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        buf.putShort((((31 * id + 17 * i) % 65536) - 32768).toShort)
        i += 1
      }
      MediaItem(id, buf.array(), "audio/wav")
    }
  }

  /** Synthesize deterministic SPEECH-SHAPED WAVs: `lead` silent frames, a
    * loud middle, `trail` silent frames — all geometry and samples pure
    * functions of doc_id (frames of 8 samples; silence |s| <= 32, loud
    * s in [8192, 24575]), so a silence-trim over the REAL decode has a
    * closed-form oracle. PCM16 is lossless end-to-end (the m09 result),
    * which is what lets the formula stand in for the decoder.
    */
  def wavSpeechFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val nf = (12 + id % 8).toInt
      val lead = (id % 4).toInt
      val trail = ((id / 4) % 4).toInt
      val n = nf * 8
      val dataLen = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(1.toShort) // mono
        .putInt(8000).putInt(8000 * 2) // sample rate, byte rate
        .putShort(2.toShort).putShort(16.toShort) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        val f = i / 8
        val s =
          if (f < lead || f >= nf - trail) ((id + i) % 64 - 32).toInt
          else ((31 * id + 17 * i) % 16384 + 8192).toInt
        buf.putShort(s.toShort)
        i += 1
      }
      MediaItem(id, buf.array(), "audio/wav")
    }
  }

  /** Silence trim over a REAL `javax.sound.sampled` decode — the m06 plan
    * with the stub energy replaced by decoded PCM16 sums (the decode path
    * m09 proved lossless): per `frameLen`-sample frame, energy = sum |s|;
    * a frame is SILENT below `threshold`; keep [first, last] non-silent.
    * m06's [[audioTrimPlan]] stays as the arbitrary-payload plumbing
    * test-double; THIS retires the audio-trim stand-in the way m11/m12
    * retired the frame-hash one. Undecodable payloads — and decodable ones
    * that are not 16-bit mono signed PCM, which the sample loop assumes —
    * degrade to one poison row (n_frames -1, the p06 convention).
    */
  def audioTrimStats(ds: Dataset[MediaItem], frameLen: Int = 8,
      threshold: Long = 1000L): Dataset[AudioTrim] = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.media))
          val fmt = in.getFormat
          val bytes = try in.readAllBytes() finally in.close()
          // the per-sample loop below assumes 16-bit mono signed PCM; a
          // decodable 8-bit/stereo/float clip or an odd-length stream would
          // produce silently WRONG trim stats, so mismatches degrade to the
          // same poison row as an undecodable payload (the p06 convention)
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              bytes.length % 2 != 0)
            throw new javax.sound.sampled.UnsupportedAudioFileException(
              s"expected 16-bit mono signed PCM, got $fmt")
          val le = !fmt.isBigEndian
          val n = bytes.length / 2
          val nFrames = (n + frameLen - 1) / frameLen
          var first = -1L; var last = -1L; var silent = 0L
          var f = 0
          while (f < nFrames) {
            var e = 0L
            var i = f * frameLen
            val end = math.min(i + frameLen, n)
            while (i < end) {
              val lo = bytes(2 * i) & 0xff
              val hi = bytes(2 * i + 1) & 0xff
              val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toLong
              e += math.abs(s)
              i += 1
            }
            if (e < threshold) silent += 1
            else { if (first < 0) first = f.toLong; last = f.toLong }
            f += 1
          }
          AudioTrim(m.doc_id, nFrames.toLong, silent, first, last,
            if (first < 0) 0L else last - first + 1L)
        } catch { case _: Exception =>
          AudioTrim(m.doc_id, -1L, -1L, -1L, -1L, -1L)
        }
      }
    }
  }

  /** Exact per-clip sample statistics through a REAL audio decode: the
    * payload is parsed and decoded by the JDK's `javax.sound.sampled`
    * (header validation + PCM frame extraction — works headless, zero
    * dependencies), samples are recovered at the decoder-reported
    * format, and the stats are exact integers so the generating formula
    * is the oracle. Same codec-per-partition seam as [[imageStats]].
    */
  final case class AudioStats(
      doc_id: Long, n_samples: Long, sample_rate: Long,
      sum_abs: Long, max_abs: Long, energy: Long)

  def audioStats(ds: Dataset[MediaItem]): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.media))
        val fmt = in.getFormat
        val bytes = try in.readAllBytes() finally in.close()
        // same 16-bit mono signed PCM contract as audioTrimStats: other
        // decodable formats would yield silently wrong sums, so they
        // degrade to the poison row instead
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            bytes.length % 2 != 0)
          throw new javax.sound.sampled.UnsupportedAudioFileException(
            s"expected 16-bit mono signed PCM, got $fmt")
        val le = !fmt.isBigEndian
        val n = bytes.length / 2
        var (sa, ma, en) = (0L, 0L, 0L)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1) & 0xff
          val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toLong
          val a = math.abs(s)
          sa += a; if (a > ma) ma = a; en += s * s
          i += 1
        }
        AudioStats(m.doc_id, n.toLong, fmt.getSampleRate.toLong, sa, ma, en)
        } catch { case _: Exception =>
          AudioStats(m.doc_id, -1L, -1L, -1L, -1L, -1L)
        }
      }
    }
  }

  /** Synthesize a deterministic multi-frame ANIMATED GIF per document —
    * the m10 fixture path (m08's PNG pattern lifted to a real VIDEO-shaped
    * container): frame count, geometry, and every pixel derive from doc_id
    * alone. Pixels are 8-bit GRAYSCALE — GIF's 256-entry palette holds the
    * full gray range, so the indexed encoding is LOSSLESS and the decode
    * can be oracled against the generating formula. Frames are written
    * through `javax.imageio`'s GIF writer as a real image sequence
    * (prepareWriteSequence / writeToSequence), one writer per partition.
    */
  def gifVideosFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id"))).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams only
      it.map { id =>
        val w = (8 + id % 5).toInt
        val h = (8 + (id * 3) % 5).toInt
        val nFrames = (2 + id % 4).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                ((7 * id + 31 * x + 13 * y + 97 * f) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        MediaItem(id, bos.toByteArray, "image/gif")
      }
    }
  }

  final case class VideoFrameStats(
      doc_id: Long, frame_idx: Long, n_frames: Long,
      width: Long, height: Long, sum_gray: Long, max_gray: Long)

  /** REAL multi-frame video decode + frame sampling through the codec
    * seam: every `step`-th frame of each container is decoded by
    * `javax.imageio`'s GIF reader (one reader per partition, reset per
    * item) to exact integer gray statistics. This is m02's frame-sampling
    * shape — typed flatMap, bounded per-item output — running on a REAL
    * container instead of the stub arithmetic, which retires the last
    * (video) codec stub. Undecodable payloads degrade to a single poison
    * row (frame_idx -1, the p06 convention), never a task failure.
    */
  def videoFrameStats(ds: Dataset[MediaItem], step: Int = 1): Dataset[VideoFrameStats] = {
    require(step >= 1, s"step must be >= 1, got $step")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      // the per-partition reader outlives the lazy iterator below, so its
      // native/decoder state is released on task completion, not here
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => reader.dispose()))
      it.flatMap { m =>
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.media))
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          // strict Range.map: every frame is decoded before the finally
          // below closes the stream the reader is bound to
          (0 until n by step).map { f =>
            val img = reader.read(f)
            val (w, h) = (img.getWidth, img.getHeight)
            var (sg, mg) = (0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = luma(img.getRGB(x, y)).toLong // gray palette: luma == gray
                sg += v; if (v > mg) mg = v
                x += 1
              }
              y += 1
            }
            VideoFrameStats(m.doc_id, f.toLong, n.toLong, w.toLong, h.toLong, sg, mg)
          }
        } catch { case _: Exception =>
          Seq(VideoFrameStats(m.doc_id, -1L, -1L, -1L, -1L, -1L, -1L))
        } finally {
          if (iis != null) { try iis.close() catch { case _: Exception => () } }
        }
      }
    }
  }

  final case class FrameDHash(doc_id: Long, frame_idx: Long, dhash: Long)

  /** ITU-R BT.601 integer luma of a packed RGB pixel: (299 r + 587 g +
    * 114 b) / 1000 — weights sum to exactly 1000, so grayscale pixels
    * (r = g = b = v) map to v EXACTLY and the lossless-fixture oracles
    * (m10-m14) are unchanged, while color frames hash on perceptual
    * brightness instead of the blue channel alone.
    */
  @inline private def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** REAL 64-bit perceptual hash (dHash, gradient variant) per decoded
    * frame: each sampled frame is reduced to a 9x8 grid of BT.601 luma
    * values ([[luma]] — exact gray for grayscale palettes, perceptual
    * brightness for color frames) by
    * nearest-neighbor downsample of the `javax.imageio`-decoded pixels
    * (grid point (cx, cy) reads pixel (cx*w/9, cy*h/8) — integer floor
    * division, so the reduction is engine-exact and a first-principles
    * oracle can replay it), and bit (cy*8 + cx) is set when the gray value
    * one grid step to the RIGHT is strictly brighter — the standard
    * horizontal-gradient dHash bit. Near-identical frames (re-encodes,
    * minor overlays) collapse to equal/close hashes while the 64-bit space
    * keeps unrelated frames apart — the candidate key m05's df-valved
    * near-dup join consumes (m11 feeds it CODEC-DERIVED hashes, retiring
    * the sampleFrames stand-in from the near-dup path; the stand-in
    * survives only as the plumbing test-double). Undecodable payloads
    * degrade to a single poison row (frame_idx -1, hash 0 — the p06
    * convention), never a task failure.
    */
  def videoFrameDHash(ds: Dataset[MediaItem], step: Int = 1): Dataset[FrameDHash] = {
    require(step >= 1, s"step must be >= 1, got $step")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => reader.dispose()))
      it.flatMap { m =>
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.media))
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n by step).map { f =>
            val img = reader.read(f)
            val (w, h) = (img.getWidth, img.getHeight)
            var hash = 0L
            var cy = 0
            while (cy < 8) {
              val sy = cy * h / 8
              var prev = luma(img.getRGB(0, sy)) // cx=0 samples x = 0*w/9 = 0
              var cx = 0
              while (cx < 8) {
                val cur = luma(img.getRGB((cx + 1) * w / 9, sy))
                if (cur > prev) hash |= 1L << (cy * 8 + cx)
                prev = cur
                cx += 1
              }
              cy += 1
            }
            FrameDHash(m.doc_id, f.toLong, hash)
          }
        } catch { case _: Exception =>
          Seq(FrameDHash(m.doc_id, -1L, 0L))
        } finally {
          if (iis != null) { try iis.close() catch { case _: Exception => () } }
        }
      }
    }
  }

  /** documents -> media table (binary payload + mime from source). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      concat(lit("application/x-"), col("source")).as("mime"))
      .as[MediaItem]
  }
}
