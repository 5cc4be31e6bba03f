package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Decoded, MediaMeta, MediaRow}

/** Multimodal plumbing tests: binaryFile ingest, schema, batched decode,
  * frame sampling, resize math, feature extraction. The codec is the
  * documented deterministic stub; everything around it is real. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mediaDir(): String = {
    val dir = Files.createTempDirectory("graft-media")
    Seq("a.img" -> 200, "b.img" -> 1000, "c.vid" -> 5000).foreach {
      case (name, n) =>
        val bytes = Array.tabulate[Byte](n)(i => ((i * 31 + name.length) % 127).toByte)
        Files.write(dir.resolve(name), bytes)
    }
    dir.toString
  }

  test("binaryFile ingest: schema, glob filter, stable ids, pruned scan") {
    val dir = mediaDir()
    val imgs = Multimodal.readMedia(spark, dir, glob = "*.img")
    assert(imgs.count() == 2)
    assert(imgs.schema("bytes").dataType.typeName == "binary")
    assert(imgs.schema("meta").dataType.typeName == "struct")
    // metadata-only query does not need the content column (column pruning)
    val plan = imgs.select("media_id", "length").queryExecution
      .executedPlan.toString
    assert(!plan.contains("bytes") || !plan.toLowerCase.contains("content"))
    // ids deterministic across reads
    val ids1 = imgs.select("media_id").as[Long].collect().sorted.toSeq
    val ids2 = Multimodal.readMedia(spark, dir, glob = "*.img")
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  private def asMediaRows(dir: String, glob: String) = {
    Multimodal.readMedia(spark, dir, glob)
      .as[MediaRow]
  }

  test("decodeImages: deterministic in bytes, correct shape, batched") {
    val dir = mediaDir()
    val rows = Multimodal.balanceBySize(
      Multimodal.readMedia(spark, dir, "*.img"), parts = 2).as[MediaRow]
    val out1 = Multimodal.decodeImages(rows, batchSize = 1, w = 8, h = 8, c = 3)
      .collect().map(d => d.media_id -> d.pixels.toSeq).toMap
    val out2 = Multimodal.decodeImages(rows, batchSize = 32, w = 8, h = 8, c = 3)
      .collect().map(d => d.media_id -> d.pixels.toSeq).toMap
    assert(out1 == out2) // batch size never changes results
    assert(out1.values.forall(_.length == 8 * 8 * 3))
    assert(out1.values.forall(p => p.forall(v => v >= 0f && v <= 1f)))
  }

  test("real PNG decode: true dimensions, exact pixel values, resize flows") {
    // write an actual 4x2 PNG with known colors via the JDK
    val dir = Files.createTempDirectory("graft-png")
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach { x =>
      (0 until 2).foreach { y =>
        img.setRGB(x, y, (x * 60 << 16) | (y * 100 << 8) | 200)
      }
    }
    javax.imageio.ImageIO.write(img, "png", dir.resolve("real.png").toFile)
    val rows = asMediaRows(dir.toString, "*.png")
    val d = Multimodal.decodeImages(rows).collect().head
    // real decode: the IMAGE's dimensions, not the stub fallback's 8x8
    assert(d.width == 4 && d.height == 2 && d.channels == 3)
    assert(d.pixels.length == 4 * 2 * 3)
    // pixel (0,0): r=0, g=0, b=200/255
    assert(d.pixels(0) == 0f && d.pixels(1) == 0f)
    assert(math.abs(d.pixels(2) - 200 / 255.0f) < 1e-6)
    // pixel (3,1): r=180/255, g=100/255
    val base = (1 * 4 + 3) * 3
    assert(math.abs(d.pixels(base) - 180 / 255.0f) < 1e-6)
    assert(math.abs(d.pixels(base + 1) - 100 / 255.0f) < 1e-6)
    // real decoded frame flows through the (real) resize math
    val r = Multimodal.resize(
      Seq(d).toDS(), 2).collect().head
    assert(r.width == 2 && r.height == 1)

    // non-image bytes in the same batch fall back to the stub, job survives
    Files.write(dir.resolve("junk.png"), Array.tabulate[Byte](64)(_.toByte))
    val mixed = Multimodal.decodeImages(asMediaRows(dir.toString, "*.png"))
      .collect()
    assert(mixed.length == 2)
    assert(mixed.exists(_.width == 4) && mixed.exists(_.width == 8))
  }

  test("sampleVideoFrames: one row per frame, offsets at everyMs cadence") {
    val dir = mediaDir()
    val vids = asMediaRows(dir, "*.vid")
    val frames = Multimodal.sampleVideoFrames(vids, everyMs = 10000L)
      .collect()
    // durationMs = length*10 = 50000 -> 5 frames at 0,10000,...,40000
    assert(frames.length == 5)
    assert(frames.map(_._2).sorted.toSeq == Seq(0L, 10000L, 20000L, 30000L, 40000L))
    assert(frames.map(_._3.toSeq).distinct.length == 5) // frames differ
  }

  test("resize: 2x average pooling halves dims and preserves mean") {
    val px = Array.tabulate[Float](8 * 8 * 1)(i => i.toFloat)
    val ds = Seq(Decoded(1L, 8, 8, 1, px)).toDS()
    val out = Multimodal.resize(ds, 2).collect().head
    assert(out.width == 4 && out.height == 4)
    assert(out.pixels.length == 16)
    // average pooling preserves the global mean exactly for full coverage
    assert(math.abs(out.pixels.sum / 16 - px.sum / 64) < 1e-4)
    // top-left block mean of [0,1,8,9] = 4.5
    assert(out.pixels(0) == 4.5f)
  }

  test("extractFeatures: mean+max per channel, usable by SimilarityOps") {
    val px = Array[Float](0.1f, 0.9f, 0.3f, 0.7f) // 2 px, 2 ch
    val ds = Seq(Decoded(7L, 2, 1, 2, px)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.embedding.length == 4)
    assert(math.abs(f.embedding(0) - 0.2f) < 1e-6) // mean ch0
    assert(math.abs(f.embedding(1) - 0.8f) < 1e-6) // mean ch1
    assert(f.embedding(2) == 0.3f && f.embedding(3) == 0.9f) // max per ch

    // end-to-end: features from media flow into cosine similarity
    val dir = mediaDir()
    val feats = Multimodal.extractFeatures(
      Multimodal.decodeImages(asMediaRows(dir, "*.img")))
      .toDF("vec_id", "embedding")
    val sims = graft.similarity.SimilarityOps
      .cosineNearDupPairs(feats, threshold = -1.0)
    assert(sims.count() == 1) // 2 images -> 1 pair, cosine defined
  }

  test("summaries match the committed fixture manifests (oracle parity)") {
    // the same equality the driver's DuckDB oracle checks for
    // q_image_decode / q_audio_decode: decode-or-stub of every committed
    // fixture reproduces the manifest rows bit-exactly
    val root = MultimodalQueries.mediaRoot
    assume(new java.io.File(root).isDirectory, s"fixtures missing at $root")
    val img = MultimodalQueries.queries("q_image_decode")(spark, "")
      .collect().map(_.toSeq).toSeq
    val imgManifest = spark.read.parquet(s"$root/manifest_img")
      .orderBy(col("file_name")).collect().map(_.toSeq).toSeq
    assert(img == imgManifest)
    // mixed corpus exercised BOTH paths: real decodes at true dims plus
    // stub fallbacks at the 8x8 default
    assert(img.exists(r => r(1) == 64 && r(2) == 48))
    assert(img.count(r => r(1) == 8 && r(2) == 8) >= 2)

    val wav = MultimodalQueries.queries("q_audio_decode")(spark, "")
      .collect().map(_.toSeq).toSeq
    val wavManifest = spark.read.parquet(s"$root/manifest_wav")
      .orderBy(col("file_name")).collect().map(_.toSeq).toSeq
    assert(wav == wavManifest)
    assert(wav.exists(r => r(1) == 44100)) // real decode at true rate
    assert(wav.exists(r => r(1) == 8000 && r(3) == 160L)) // stub fallback

    val vid = MultimodalQueries.queries("q_frame_sample")(spark, "")
      .collect().map(_.toSeq).toSeq
    // BOTH container manifests (gif + mjpeg-avi) — same union the
    // DuckDB oracle takes
    val vidManifest = spark.read.parquet(s"$root/manifest_gif")
      .unionByName(spark.read.parquet(s"$root/manifest_avi"))
      .orderBy(col("file_name"), col("frame_ms")).collect()
      .map(_.toSeq).toSeq
    assert(vid == vidManifest)
    // real decodes at true dims (16x12x3 = 576) + stub fallbacks (192),
    // from each container family
    assert(vid.exists(r => r(2) == 576L &&
      r(0).toString.endsWith(".gif")))
    assert(vid.exists(r => r(2) == 576L &&
      r(0).toString.endsWith(".avi")))
    assert(vid.exists(r => r(2) == 192L))
  }

  test("GifVideoCodec: frame-exact round trip through the JDK GIF codec") {
    // websafe-indexed frames → animated GIF → decode: every pixel of
    // every frame must round-trip bit-exactly (palette colors only, so
    // no quantization), and GCE delays must come back as frame offsets
    val delays = Seq(20, 40, 30) // centiseconds
    val frames = delays.indices.map(k =>
      graft.tools.MakeMediaFixtures.makeFrame(seed = 42L, k, 11, 7))
    val gif = graft.tools.MakeMediaFixtures.encodeGif(frames, delays)
    val Some((decoded, durationMs)) =
      Multimodal.GifVideoCodec.decodeFrames(gif)
    assert(durationMs == 900L)
    assert(decoded.map(_._1) == Seq(0L, 200L, 600L))
    decoded.zip(frames).foreach { case ((_, d), src) =>
      assert(d.width == 11 && d.height == 7 && d.channels == 3)
      val expected = for {
        y <- 0 until 7; x <- 0 until 11
        rgb = src.getRGB(x, y)
        v <- Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      } yield v / 255.0f
      assert(d.pixels.toSeq == expected, "pixel mismatch")
    }

    // sampling picks the frame ACTIVE at each instant: delays 200/400/300
    // → frame starts at 0, 200, 600; at 100 ms cadence, 9 samples
    val Some(sampled) = Multimodal.GifVideoCodec.sampleFrames(gif, 100L)
    assert(sampled.map(_._1) == (0L until 900L by 100L).toSeq)
    val byStart = decoded.toMap
    assert(sampled.forall { case (t, px) =>
      val active = decoded.reverseIterator.find(_._1 <= t).get._2
      px.toSeq == active.pixels.toSeq
    })

    // single-frame clip: zero duration still yields exactly one sample
    val one = graft.tools.MakeMediaFixtures.encodeGif(
      Seq(graft.tools.MakeMediaFixtures.makeFrame(7L, 0, 4, 4)), Seq(0))
    assert(Multimodal.GifVideoCodec.sampleFrames(one, 250L).get.size == 1)

    // bytes the GIF reader cannot parse → None (stub fallback upstream)
    assert(Multimodal.GifVideoCodec.decodeFrames(
      Array.tabulate[Byte](100)(_.toByte)).isEmpty)
    assert(byStart.size == 3)
  }

  test("AviMjpegCodec: RIFF/MJPEG round trip — timing from the AVI " +
    "header, µs-exact frame selection, malformed inputs rejected") {
    val frames = (0 until 3).map(k =>
      graft.tools.MakeMediaFixtures.makeFrame(seed = 31L, k, 10, 6))
    val avi = graft.tools.MakeMediaFixtures.encodeAviMjpeg(frames, 400000L)
    assert(Multimodal.AviMjpegCodec.looksLikeAvi(avi))
    val Some((decoded, durationMs)) =
      Multimodal.AviMjpegCodec.decodeFrames(avi)
    assert(durationMs == 1200L)
    assert(decoded.map(_._1) == Seq(0L, 400L, 800L))
    assert(decoded.forall { case (_, d) =>
      d.width == 10 && d.height == 6 && d.channels == 3 &&
        d.pixels.length == 180 })
    // JPEG is lossy but the decode is deterministic: two decodes agree
    val again = Multimodal.AviMjpegCodec.decodeFrames(avi).get._1
    assert(decoded.map(_._2.pixels.toSeq) == again.map(_._2.pixels.toSeq))

    // frames are independent (no compositing): each sampled frame equals
    // its decodeFrames twin, selected by the last-start-<=-t rule
    val Some(sampled) = Multimodal.AviMjpegCodec.sampleFrames(avi, 250L)
    assert(sampled.map(_._1) == Seq(0L, 250L, 500L, 750L))
    assert(sampled.forall { case (t, px) =>
      val active = decoded.reverseIterator.find(_._1 <= t).get._2
      px.toSeq == active.pixels.toSeq
    })

    // 30 fps (33333 µs): instant 500 ms lands in frame 15 by exact µs
    // math — per-frame ms truncation would pick frame 16 at some instants
    val thirty = graft.tools.MakeMediaFixtures.encodeAviMjpeg(
      (0 until 20).map(k =>
        graft.tools.MakeMediaFixtures.makeFrame(77L, k, 6, 6)), 33333L)
    val Some(s30) = Multimodal.AviMjpegCodec.sampleFrames(thirty, 100L)
    val Some((d30, dur30)) = Multimodal.AviMjpegCodec.decodeFrames(thirty)
    assert(dur30 == 666L && s30.size == 6)
    assert(s30.forall { case (t, px) =>
      val j = math.min(19L, t * 1000L / 33333L).toInt
      px.toSeq == d30(j)._2.pixels.toSeq
    })

    // malformed containers -> None (stub upstream): truncated mid-chunk,
    // non-AVI bytes, and a valid container with an undecodable frame
    assert(Multimodal.AviMjpegCodec
      .decodeFrames(avi.take(avi.length / 2)).isEmpty)
    assert(Multimodal.AviMjpegCodec
      .sampleFrames(avi.take(avi.length / 2), 250L).isEmpty)
    assert(Multimodal.AviMjpegCodec
      .decodeFrames(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
    val corrupt = avi.clone()
    val dc = avi.indices.find(p => p + 4 <= avi.length &&
      avi(p) == '0' && avi(p + 1) == '0' && avi(p + 2) == 'd' &&
      avi(p + 3) == 'c').get
    (dc + 8 until dc + 40).foreach(p => corrupt(p) = 0x5a)
    assert(Multimodal.AviMjpegCodec.decodeFrames(corrupt).isEmpty)
    // sampleClip dispatch: AVI bytes use the real codec, junk the stub
    assert(Multimodal.sampleClip(avi, 1000L, 250L).map(_._1) ==
      Seq(0L, 250L, 500L, 750L))
    assert(Multimodal.sampleClip(corrupt, 1000L, 250L)
      .forall(_._2.length == 8 * 8 * 3)) // stub shape
  }

  test("q_frame_sample: deterministic frames, multi-frame clips present") {
    val root = MultimodalQueries.mediaRoot
    assume(new java.io.File(root).isDirectory)
    val run1 = MultimodalQueries.queries("q_frame_sample")(spark, "")
      .collect().map(_.toSeq).toSeq
    val run2 = MultimodalQueries.queries("q_frame_sample")(spark, "")
      .collect().map(_.toSeq).toSeq
    assert(run1.nonEmpty && run1 == run2) // pure function of the bytes
    // the longer clips yield >1 frame at the 20s cadence, so the
    // per-media flatMap fan-out is actually exercised
    val perMedia = run1.groupBy(_.head).values.map(_.size)
    assert(perMedia.exists(_ > 1) && perMedia.exists(_ == 1))
  }

  test("imageSummaries agrees with decodeImages + pixelChecksum") {
    val root = MultimodalQueries.mediaRoot
    assume(new java.io.File(root).isDirectory)
    val media = Multimodal.readMedia(spark, s"$root/img", "*.png")
      .as[MediaRow]
    val viaSummary = Multimodal.imageSummaries(media)
      .collect().map(s => s.file_name.take(6) -> s.pixel_checksum).toMap
    val viaDecode = Multimodal.decodeImages(media)
      .collect().map(d => d.media_id -> Multimodal.pixelChecksum(d.pixels))
      .toMap
    // same multiset of checksums (ids key one path, names the other)
    assert(viaSummary.values.toSeq.sorted ==
      viaDecode.values.toSeq.sorted)
  }

  test("perceptualHash: deterministic, brightness/noise invariant on the " +
      "fixtures, scale-robust, distinct bases far apart") {
    import Multimodal._
    val root = MultimodalQueries.mediaRoot
    def hashOf(name: String): Long = {
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Path.of(s"$root/phash/$name"))
      val d = ImageIoCodec.decodeImage(b).get
      perceptualHash(d.pixels, d.width, d.height, d.channels)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // decode + hash twice: bit-identical
    assert(hashOf("ph_00.png") == hashOf("ph_00.png"))
    // planted perturbations stay within the dedup threshold
    assert(ham(hashOf("ph_00.png"), hashOf("ph_00_bright.png")) <= 4)
    assert(ham(hashOf("ph_01.png"), hashOf("ph_01_noise.png")) <= 4)
    assert(ham(hashOf("ph_02.png"), hashOf("ph_02_up2x.png")) <= 8)
    // structurally distinct bases land far apart
    for (i <- 0 until 6; j <- (i + 1) until 6)
      assert(ham(hashOf(f"ph_$i%02d.png"), hashOf(f"ph_$j%02d.png")) > 10,
        s"bases $i/$j too close")
  }

  test("perceptualHash matches an independent direct-DCT reimplementation " +
      "of the published pHash recipe") {
    // Anchors the hash SEMANTICS (luma weights, box-average resize, DCT-II
    // definition, 8×8 low-frequency block, median-of-63 threshold with the
    // DC bit forced 0, bit order) against a from-scratch derivation: the
    // committed manifest that q_phash's oracle reads is generated by the
    // same Multimodal.perceptualHash under test, so without this anchor a
    // bug in the DCT/median logic would be baked into the manifest and
    // pass both driver queries. This reimplementation is non-separable
    // (direct quadruple loop, per-term StrictMath.cos — no cosine table)
    // and selects the median by explicit rank, so it shares no structure
    // with the production code beyond the recipe itself.
    def referencePhash(px: Array[Float], w: Int, h: Int, c: Int): Long = {
      val N = 32; val K = 8
      def luma(x: Int, y: Int): Double = {
        val b = (y * w + x) * c
        def ch(i: Int) =
          Math.round(px(b + math.min(i, c - 1)) * 255f).toDouble
        0.299 * ch(0) + 0.587 * ch(1) + 0.114 * ch(2)
      }
      val g = Array.tabulate(N, N) { (ty, tx) =>
        val (y0, x0) = (ty * h / N, tx * w / N)
        val y1 = math.max((ty + 1) * h / N, y0 + 1)
        val x1 = math.max((tx + 1) * w / N, x0 + 1)
        val vals = for (y <- y0 until y1; x <- x0 until x1) yield luma(x, y)
        vals.sum / vals.length
      }
      val coef = Array.tabulate(K, K) { (v, u) =>
        var s = 0.0
        for (y <- 0 until N; x <- 0 until N)
          s += g(y)(x) *
            StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * N)) *
            StrictMath.cos(StrictMath.PI * (2 * y + 1) * v / (2.0 * N))
        s
      }
      val flat = (for (v <- 0 until K; u <- 0 until K) yield coef(v)(u))
        .toArray
      val nonDc = flat.drop(1).sorted
      val median = nonDc(31) // 32nd smallest: 31 strictly-ranked below
      // self-check: every thresholded coefficient sits far from the
      // median relative to summation-order fp noise, so separable vs
      // direct evaluation cannot flip a bit on this input
      val gap = flat.drop(1).map(x => math.abs(x - median))
        .filter(_ > 0).min
      assert(gap > 1e-6, s"degenerate test image: median gap $gap")
      (1 until K * K).foldLeft(0L)((acc, i) =>
        if (flat(i) > median) acc | (1L << i) else acc)
    }
    // deterministic LCG-filled images: one 32×32 (identity resize) and
    // one 48×40 (real box-average blocks)
    for ((w, h) <- Seq((32, 32), (48, 40))) {
      var seed = 0x9e3779b97f4a7c15L ^ (w * 1000L + h)
      val px = Array.fill(w * h * 3) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ((seed >>> 40) & 0xff).toFloat / 255f
      }
      assert(Multimodal.perceptualHash(px, w, h, 3) ==
        referencePhash(px, w, h, 3), s"${w}x$h hash mismatch")
    }
  }

  test("audioSpectrogram: a pure tone at a band's center frequency puts " +
      "that band's energy on top in every frame") {
    // semantic anchor for the spectrogram (the manifest only pins
    // determinism): band centers are fc(b) = 100 · 35^(b/31) Hz, so a
    // sine at fc(10) must make band 10 the per-frame argmax
    val rate = 8000
    val bands = 32
    for (b <- Seq(5, 10, 20)) {
      val fc = 100.0 * StrictMath.pow(35.0, b / 31.0)
      val n = rate / 2
      val samples = Array.tabulate(n)(i =>
        (0.5 * StrictMath.sin(2 * StrictMath.PI * fc * i / rate)).toFloat)
      val spec = Multimodal.audioSpectrogram(samples, 1, rate,
        frames = 8, bands = bands)
      for (t <- 0 until 8) {
        val col = (0 until bands).map(bb => spec(bb * 8 + t))
        assert(col.indexOf(col.max) == b,
          s"tone at band $b center peaked at band ${col.indexOf(col.max)}")
      }
    }
  }

  test("audioFingerprint: gain shift is EXACTLY invariant, resample and " +
      "re-containering stay within a few bits, distinct melodies are far") {
    import Multimodal._
    val root = MultimodalQueries.mediaRoot
    assume(new java.io.File(s"$root/afp").isDirectory)
    def fpOf(name: String): Long = {
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Path.of(s"$root/afp/$name"))
      audioFingerprint(WavCodec.decodeAudio(b).get)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(fpOf("afp_00.wav") == fpOf("afp_00.wav")) // deterministic
    // gain scales every |X|² by g²: +constant in the log domain, and the
    // only DCT coefficient that moves is the DC bit the hash forces 0 —
    // so the invariance is exact, not approximate
    assert(ham(fpOf("afp_00.wav"), fpOf("afp_00_gain.wav")) == 0)
    // 2× resample: absolute band frequencies + time-proportional frames
    // approximate the same integrals
    assert(ham(fpOf("afp_01.wav"), fpOf("afp_01_rs2x.wav")) <= 6)
    // AU re-container: same PCM through javax.sound
    assert(ham(fpOf("afp_02.wav"), fpOf("afp_02_au.au")) == 0)
    for (i <- 0 until 5; j <- (i + 1) until 5)
      assert(ham(fpOf(f"afp_$i%02d.wav"), fpOf(f"afp_$j%02d.wav")) > 10,
        s"melodies $i/$j too close")
  }

  test("videoFingerprint: brightness and re-timing are EXACTLY " +
      "invariant, upscale/re-encode stay within a few bits, distinct " +
      "motion is far") {
    import Multimodal._
    val root = MultimodalQueries.mediaRoot
    assume(new java.io.File(s"$root/vfp").isDirectory)
    def fpOf(name: String): Long = {
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Path.of(s"$root/vfp/$name"))
      videoFingerprint(b, b.length * 10L)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(fpOf("vf_00.gif") == fpOf("vf_00.gif")) // deterministic
    // one-lattice-step brightness adds a constant to every grid cell:
    // only the DC coefficient moves, and dctHash64 forces that bit 0 —
    // exact invariance (the fixtures keep values off the clamp)
    assert(ham(fpOf("vf_00.gif"), fpOf("vf_00_bright.gif")) == 0)
    // re-timing (same frames, 2× delays): slices index the sample list
    // PROPORTIONALLY, so the doubled clip lands on the same frames
    assert(ham(fpOf("vf_01.gif"), fpOf("vf_01_slow.gif")) == 0)
    // 2× nearest upscale: slab boundaries shift sub-row, means barely move
    assert(ham(fpOf("vf_02.gif"), fpOf("vf_02_up2x.gif")) <= 4)
    // MJPEG re-encode of the same frames: lossy but low-frequency
    assert(ham(fpOf("vf_03.gif"), fpOf("vf_03_avi.avi")) <= 8)
    // structurally distinct motion (every clip has its own y(t)
    // trajectory): far beyond the 10-bit near-dup line
    for (i <- 0 until 5; j <- (i + 1) until 5)
      assert(ham(fpOf(f"vf_$i%02d.gif"), fpOf(f"vf_$j%02d.gif")) > 10,
        s"clips $i/$j too close")
  }

  test("videoFingerprint matches an independent reimplementation of the " +
      "temporal-grid recipe") {
    // Anchors the fingerprint SEMANTICS (proportional slice indexing,
    // index-range slabs over interleaved RGB, pHash luma weights, the
    // shared DCT-median core) against a from-scratch derivation — the
    // committed manifest q_video_fp's oracle reads is generated by the
    // same videoFingerprint under test, so without this anchor a bug in
    // the grid/DCT logic would be baked in and pass both driver queries
    // (the perceptualHash anchor discipline). The reimplementation
    // decodes GIF frames directly (full-frame fixtures: no compositing),
    // walks pixels by (x, y) instead of flat index, and evaluates the
    // DCT non-separably with per-term StrictMath.cos.
    import Multimodal._
    val root = MultimodalQueries.mediaRoot
    assume(new java.io.File(s"$root/vfp").isDirectory)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of(s"$root/vfp/vf_00.gif"))
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis, false)
    val n = reader.getNumImages(true) // 8 frames × 100 ms
    val frames = (0 until n).map(reader.read)
    reader.dispose(); iis.close()
    // duration 800 ms sampled at 100 ms ⇒ samples ARE the frames
    val (slices, bands) = (32, 32)
    val grid = new Array[Double](slices * bands)
    for (k <- 0 until slices; b <- 0 until bands) {
      val img = frames((k * n) / slices)
      val (w, h) = (img.getWidth, img.getHeight)
      val np = w * h
      val (lo, hi) = ((b * np) / bands, ((b + 1) * np) / bands)
      val lums = (lo until hi).map { p =>
        val rgb = img.getRGB(p % w, p / w)
        0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      grid(b * slices + k) = lums.sum / lums.length
    }
    val N = 32; val K = 8
    val g32 = Array.tabulate(N, N)((y, x) => grid(y * N + x))
    val coef = Array.tabulate(K, K) { (v, u) =>
      var s = 0.0
      for (y <- 0 until N; x <- 0 until N)
        s += g32(y)(x) *
          StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * N)) *
          StrictMath.cos(StrictMath.PI * (2 * y + 1) * v / (2.0 * N))
      s
    }
    val flat = (for (v <- 0 until K; u <- 0 until K) yield coef(v)(u))
      .toArray
    val nonDc = flat.drop(1).sorted
    val median = nonDc(31)
    val gap = flat.drop(1).map(x => math.abs(x - median))
      .filter(_ > 0).min
    assert(gap > 1e-6, s"degenerate clip: median gap $gap")
    val expect = (1 until K * K).foldLeft(0L)((acc, i) =>
      if (flat(i) > median) acc | (1L << i) else acc)
    assert(videoFingerprint(bytes, bytes.length * 10L) == expect)
  }

  test("hammingPairs equals the brute-force pair set on the phash corpus") {
    import Multimodal._
    val root = MultimodalQueries.mediaRoot
    val media = Multimodal.readMedia(spark, s"$root/phash", "*.png")
      .as[MediaRow]
    val hashes = Multimodal.imagePhashes(media).toDF()
    val banded = graft.dedup.DedupOps
      .hammingPairs(hashes, "file_name", "phash", maxDist = 10)
      .select("id_a", "id_b", "dist")
      .as[(String, String, Int)].collect().toSet
    val h = hashes.as[(String, Long)].collect()
    val brute = (for {
      (a, ha) <- h; (b, hb) <- h if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 10
    } yield (a, b, d)).toSet
    assert(banded == brute && brute.size == 3)
  }

  test("persisted hamming index: probe equals the direct banded join; " +
      "append equals rebuild; layout pin guards probes and appends") {
    import graft.dedup.DedupOps
    // synthetic 64-bit signatures with planted distances: b is 3 bits
    // from a, c is 8 bits from a, d is far from everything
    val sigs = Seq(
      ("a", 0x0123456789abcdefL),
      ("b", 0x0123456789abcde0L ^ 0x0fL), // dist(a,b) small
      ("c", 0x0123456789ab0000L),
      ("d", 0x7edcba9876543210L),
      ("e", 0x0123456789abcdefL)) // exact dup of a
      .toDF("id", "sig")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, String, Int)].collect().toSet
    val direct = pairs(DedupOps.hammingPairs(sigs, "id", "sig", 10)
      .select($"id_a", $"id_b", $"dist".cast("int")))
    // full build + self-probe, oriented
    val idx = java.nio.file.Files
      .createTempDirectory("hamidx").toString
    DedupOps.hammingIndexBuild(sigs, idx, maxDist = 10)
    def probed(path: String) = pairs(
      DedupOps.hammingNearDupIndexed(spark, path, sigs)
        .filter($"probe_id" < $"id")
        .select($"probe_id", $"id", $"dist".cast("int")))
    assert(probed(idx) == direct, "indexed probe != direct banded join")
    // append ≡ rebuild: index half, append the other half
    val idx2 = java.nio.file.Files
      .createTempDirectory("hamidx2").toString
    DedupOps.hammingIndexBuild(sigs.filter($"id" <= "c"), idx2,
      maxDist = 10)
    DedupOps.hammingIndexAppend(sigs.filter($"id" > "c"), idx2)
    assert(probed(idx2) == direct, "append diverged from rebuild")
    // ADD-ONLY contract: re-appending an already-indexed id fails loud
    // (both sigs would live in the table and probes would pick an
    // arbitrary one) — re-signing means rebuild
    val dup = intercept[IllegalArgumentException] {
      DedupOps.hammingIndexAppend(sigs.filter($"id" === "a"), idx2)
    }
    assert(dup.getMessage.contains("ADD-ONLY") &&
      dup.getMessage.contains("'a'"))
    // a WITHIN-batch duplicate id corrupts the same way — also loud
    val dupIn = intercept[IllegalArgumentException] {
      DedupOps.hammingIndexAppend(
        Seq(("z", 1L), ("z", 2L)).toDF("id", "sig"), idx2)
    }
    assert(dupIn.getMessage.contains("more than once"))
    assert(probed(idx2) == direct,
      "a refused append must leave the index untouched")
    // the layout pin makes a mismatched or missing layout impossible
    val noIdx = java.nio.file.Files
      .createTempDirectory("hamidx3").toString
    val e = intercept[IllegalArgumentException] {
      DedupOps.hammingNearDupIndexed(spark, noIdx, sigs)
    }
    assert(e.getMessage.contains("_hamming_layout"))
    intercept[IllegalArgumentException] {
      DedupOps.hammingIndexAppend(sigs, noIdx)
    }
    // an empty probe batch fails loud, never a silent empty frame
    val ep = intercept[IllegalArgumentException] {
      DedupOps.hammingNearDupIndexed(spark, idx, sigs.limit(0))
    }
    assert(ep.getMessage.contains("no chunk targets"))
    // the probe targets reach the chunk scan as PARTITION filters —
    // the index prunes at file-listing time, never a full-index scan
    val plan = DedupOps.hammingNearDupIndexed(spark, idx,
        sigs.filter($"id" === "a"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("chunk"), plan.take(1200))
  }
}
