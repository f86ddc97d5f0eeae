package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The multimodal codec seam: one codec per partition, stub and real
  * decoders interchangeable behind the same mapPartitions plan (the m05
  * claim), and the REAL `javax.imageio` path verified against the pixel
  * formula that generated the images — only an actual lossless
  * encode→decode can reproduce it.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def pngs = Multimodal.pngImagesFromDocuments(
    graft.sources.Tables.load(spark, dir, "documents").limit(40))

  test("stub <-> real codec swap changes only the factory argument, not the plan") {
    val media = pngs
    val stubbed = Multimodal.extractFeatures(media, () => new Multimodal.FakeCodec)
    val real = Multimodal.extractFeatures(media) // default is the REAL codec
    // identical plan shape: the codec crosses as the closure's factory, the
    // Spark-side plumbing (schema + operator stack) is byte-for-byte the same
    assert(stubbed.schema == real.schema)
    def shape(df: org.apache.spark.sql.Dataset[_]): Seq[String] =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
    assert(shape(stubbed) == shape(real),
      s"plan shape must not change on codec swap:\n${shape(stubbed)}\nvs\n${shape(real)}")
    // and both decode: the stub answers its deterministic formula, the real
    // one answers the actual PNG geometry
    val sRow = stubbed.filter(_.doc_id == 0L).collect().head
    val rRow = real.filter(_.doc_id == 0L).collect().head
    assert(sRow.width == sRow.byte_len % 640)
    assert(rRow.width == 8L && rRow.height == 8L) // doc 0: 8 + 0%8, 8 + 0%8
  }

  test("imageio decode reproduces the generating pixel formula exactly") {
    val stats = Multimodal.imageStats(pngs).collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(0L, 1L, 7L, 13L, 39L) if stats.contains(id)) {
      val st = stats(id)
      val w = (8 + id % 8).toInt
      val h = (8 + (id * 3) % 8).toInt
      var (sr, sg, sb, ml) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (7 * id + 31 * x + 13 * y) % 256
        val g = (11 * id + 17 * x + 29 * y) % 256
        val b = (5 * id + 23 * x + 19 * y) % 256
        sr += r; sg += g; sb += b
        if (r + g + b > ml) ml = r + g + b
      }
      assert(st.width == w && st.height == h && st.n_px == w.toLong * h)
      assert((st.sum_r, st.sum_g, st.sum_b, st.max_lum3) == ((sr, sg, sb, ml)),
        s"doc $id decode mismatch")
    }
  }

  test("javax.sound decode reproduces the generating PCM formula exactly") {
    val wavs = Multimodal.wavFromDocuments(
      graft.sources.Tables.load(spark, dir, "documents").limit(20))
    val stats = Multimodal.audioStats(wavs).collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(0L, 1L, 13L, 19L) if stats.contains(id)) {
      val st = stats(id)
      val n = (64 + id % 64).toInt
      var (sa, ma, en) = (0L, 0L, 0L)
      for (i <- 0 until n) {
        val s = (31 * id + 17 * i) % 65536 - 32768
        val a = math.abs(s)
        sa += a; if (a > ma) ma = a; en += s * s
      }
      assert(st.n_samples == n && st.sample_rate == 8000L)
      assert((st.sum_abs, st.max_abs, st.energy) == ((sa, ma, en)),
        s"clip $id decode mismatch")
    }
  }

  test("undecodable payloads degrade to poison rows, not failures (p06 convention)") {
    val s = spark
    import s.implicits._
    val junk = Seq(Multimodal.MediaItem(99L, Array[Byte](1, 2, 3), "image/png"))
      .toDS()
    val out = Multimodal.extractFeatures(junk, () => new Multimodal.ImageIoCodec)
      .collect()
    assert(out.length == 1 && out.head.width == -1L && out.head.frames == 0L)
    // the video decoder degrades the same way: corrupt container -> a
    // single poison frame row, the rest of the partition unaffected
    val vid = Multimodal.videoFrameStats(junk).collect()
    assert(vid.length == 1 && vid.head.frame_idx == -1L && vid.head.n_frames == -1L)
    // and the real audio trim: corrupt WAV -> one poison row
    val tr = Multimodal.audioTrimStats(junk).collect()
    assert(tr.length == 1 && tr.head.n_frames == -1L)
  }

  test("animated GIF sequence round-trips losslessly; frame sampling honors step") {
    val s = spark
    import s.implicits._
    val gifs = Multimodal.gifVideosFromDocuments(
      graft.sources.Tables.load(spark, dir, "documents").limit(24))
    // step=1 decodes every frame: counts and geometry follow the fixture
    val all = Multimodal.videoFrameStats(gifs, step = 1).collect()
    all.groupBy(_.doc_id).foreach { case (id, fs) =>
      assert(fs.length == (2 + id % 4).toInt, s"doc $id frame count")
      assert(fs.forall(f => f.n_frames == 2 + id % 4
        && f.width == 8 + id % 5 && f.height == 8 + (id * 3) % 5))
      // per-frame gray sums match the generating formula exactly (the GIF
      // palette holds all 256 grays, so the indexed encode is lossless)
      fs.foreach { f =>
        val (w, h) = (f.width.toInt, f.height.toInt)
        val expect = (for (y <- 0 until h; x <- 0 until w)
          yield (7 * id + 31 * x + 13 * y + 97 * f.frame_idx) % 256).sum
        assert(f.sum_gray == expect, s"doc $id frame ${f.frame_idx} gray sum")
      }
    }
    // step=2 keeps exactly the even frame indices
    val sampled = Multimodal.videoFrameStats(gifs, step = 2).collect()
    sampled.groupBy(_.doc_id).foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq ==
        (0L until (2 + id % 4)).by(2L).toSeq, s"doc $id sampled frames")
    }
  }

  test("perceptual dHash derives from DECODED pixels and matches the grid formula") {
    val s = spark
    import s.implicits._
    val gifs = Multimodal.gifVideosFromDocuments(
      graft.sources.Tables.load(spark, dir, "documents").limit(24))
    val hashes = Multimodal.videoFrameDHash(gifs).collect()
    hashes.groupBy(_.doc_id).foreach { case (id, fs) =>
      assert(fs.length == (2 + id % 4).toInt, s"doc $id hash count")
      val (w, h) = ((8 + id % 5).toInt, (8 + (id * 3) % 5).toInt)
      fs.foreach { fh =>
        // first-principles dHash: 9x8 nearest-neighbor grid over the
        // generating gray formula, bit = right neighbor strictly brighter.
        // Only a lossless decode of the real container can reproduce it.
        var expect = 0L
        for (cy <- 0 until 8; cx <- 0 until 8) {
          val sy = cy * h / 8
          val g0 = (7 * id + 31 * (cx * w / 9) + 13 * sy + 97 * fh.frame_idx) % 256
          val g1 = (7 * id + 31 * ((cx + 1) * w / 9) + 13 * sy + 97 * fh.frame_idx) % 256
          if (g1 > g0) expect |= 1L << (cy * 8 + cx)
        }
        assert(fh.dhash == expect, s"doc $id frame ${fh.frame_idx} dHash")
      }
    }
    // identical payloads hash identically (the near-dup premise) and the
    // poison path degrades like every other decoder (p06 convention).
    // Anchor on an id KNOWN to be in the (order-nondeterministic) limit
    // set rather than hardcoding one that a layout change could drop.
    val anchor = hashes.map(_.doc_id).min
    val anchorMedia = gifs.filter(_.doc_id == anchor).collect().head.media
    val twin = Seq(anchor, anchor + 100000L).map { id =>
      Multimodal.MediaItem(id, anchorMedia, "image/gif")
    }.toDS()
    val th = Multimodal.videoFrameDHash(twin).collect()
    assert(th.groupBy(_.frame_idx).values.forall(_.map(_.dhash).distinct.size == 1))
    val junk = Seq(Multimodal.MediaItem(99L, Array[Byte](9, 9, 9), "video/gif")).toDS()
    val poison = Multimodal.videoFrameDHash(junk).collect()
    assert(poison.length == 1 && poison.head.frame_idx == -1L)
  }
}
