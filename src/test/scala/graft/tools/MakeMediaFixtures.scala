package graft.tools

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, File}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.SparkSession

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{AudioSummary, FrameSummary, ImageSummary}

/** Generates the committed multimodal test fixtures under
  * `fixtures/media/`: deterministic PNG images and PCM-16 WAV clips (plus
  * deliberately-corrupt files exercising the stub fallback), and a
  * DuckDB-readable manifest parquet per modality whose rows are the EXACT
  * decode summaries ([[Multimodal.imageSummaries]] /
  * [[Multimodal.audioSummaries]] semantics, computed by round-tripping the
  * bytes just written through the same codecs). The manifests are the
  * oracle for `q_image_decode` / `q_audio_decode`.
  *
  * Run once from the repo root; the outputs are committed, so verify/bench
  * never regenerate them:
  *   sbt "Test/runMain graft.tools.MakeMediaFixtures"
  *
  * Pixel/sample content derives from a splitmix64-style LCG seeded by the
  * file index — no wall clock, no RNG state, identical bytes every run.
  */
object MakeMediaFixtures {

  private def mix(seed: Long, i: Long): Long = {
    var x = seed * 6364136223846793005L + i * 1442695040888963407L
    x ^= (x >>> 33); x *= -49064778989728563L; x ^= (x >>> 29)
    x
  }

  private def makePng(idx: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = mix(idx * 7919L + 17L, (y.toLong << 20) | x.toLong)
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A STRUCTURED image (stripes + a contrasting rectangle) for the
    * perceptual-hash fixtures — pHash is about low-frequency structure,
    * so unlike [[makePng]]'s noise these have stable DCT signatures.
    * `brightness` shifts every channel; `noiseAmp` sprinkles ±amp
    * per-pixel noise; `scale` integer-upsamples (nearest) — the three
    * perturbations a near-dup detector must shrug off. */
  private def makeStructuredPng(idx: Int, w: Int, h: Int,
      brightness: Int = 0, noiseAmp: Int = 0, scale: Int = 1)
      : Array[Byte] = {
    val img = new BufferedImage(w * scale, h * scale,
      BufferedImage.TYPE_INT_RGB)
    val (ks, kt) = (2 + idx % 5, 3 + (idx / 5) % 4)
    val (rx, ry, rw, rh) = (w / 5 + idx % 3, h / 4, w / 3, h / 3)
    var y = 0
    while (y < h * scale) {
      var x = 0
      while (x < w * scale) {
        val (sx, sy) = (x / scale, y / scale)
        val inRect = sx >= rx && sx < rx + rw && sy >= ry && sy < ry + rh
        def clamp(v: Int) = math.max(0, math.min(255, v))
        val base =
          if (inRect) 220 - ((idx * 17) % 60)
          else (sx * ks * 255 / w + sy * kt * 128 / h) % 200
        val noise =
          if (noiseAmp == 0) 0
          else ((mix(idx * 131L + 7L, (sy.toLong << 20) | sx.toLong)
            % (2 * noiseAmp + 1)) - noiseAmp).toInt
        val v = clamp(base + brightness + noise)
        val g2 = clamp(v + (if (inRect) -30 else 20))
        val b2 = clamp(255 - v)
        img.setRGB(x, y, (v << 16) | (g2 << 8) | b2)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def makeWav(idx: Int, rate: Int, channels: Int, nFrames: Int)
      : Array[Byte] = {
    val raw = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      val s = ((mix(idx * 104729L + 31L, i.toLong) >>> 40) & 0xffff).toInt - 32768
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, channels * 2, rate, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A STRUCTURED clip (an 8-segment "melody" of pure tones drawn from
    * a per-clip seed) for the audio-fingerprint fixtures — like
    * [[makeStructuredPng]] vs [[makePng]], the spectral hash is about
    * band-time structure, so unlike [[makeWav]]'s noise these have
    * stable spectrogram signatures. `gain` scales amplitude (the
    * fingerprint must shrug it off); `rate` resamples the SAME analytic
    * signal (segment boundaries are time-proportional, so a 2× rate is
    * the resample perturbation). */
  def makeToneWav(idx: Int, rate: Int, gain: Double = 0.5,
      durMs: Int = 400): Array[Byte] = {
    val n = rate * durMs / 1000
    val segs = 8
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val seg = math.min(i * segs / n, segs - 1)
      // per-(clip, segment) tone from the log-spaced fingerprint band
      // range: 150 · 1.31^k Hz, k ∈ [0, 11] — inside [100, 3500]
      val k = ((mix(idx * 524287L + 101L, seg.toLong) >>> 33) % 12).toInt
      val f = 150.0 * StrictMath.pow(1.31, k)
      val t = i.toDouble / rate
      val s = (StrictMath.sin(2.0 * StrictMath.PI * f * t) * gain
        * 32767.0).toInt
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      1, 2, rate, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def write(f: File, bytes: Array[Byte]): Unit = {
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, bytes)
  }

  /** The 216-color websafe palette as an IndexColorModel: every frame
    * pixel is an exact palette color, so the GIF LZW round trip is
    * bit-exact (no quantization) — what makes the frame-exact spec and
    * the manifest oracle possible. */
  def websafePalette: java.awt.image.IndexColorModel = {
    val n = 216
    val (r, g, b) = (new Array[Byte](n), new Array[Byte](n), new Array[Byte](n))
    var i = 0
    while (i < n) {
      r(i) = ((i / 36) * 51).toByte
      g(i) = (((i / 6) % 6) * 51).toByte
      b(i) = ((i % 6) * 51).toByte
      i += 1
    }
    new java.awt.image.IndexColorModel(8, n, r, g, b)
  }

  /** A STRUCTURED MOTION frame for the video-fingerprint fixtures: a
    * bright rectangle DESCENDING over a banded gradient as `k` runs
    * 0..nFrames-1. Every channel value sits on the websafe lattice
    * (multiples of 51, greyscale) so the GIF palette round-trip is
    * LOSSLESS and a one-step brightness shift stays exact on the
    * lattice (204+51 = 255 — no clamping, so the shift is a pure DC
    * move for the temporal-grid hash). Motion is VERTICAL because the
    * fingerprint's slabs are horizontal — only y-motion lands in the
    * time axis it fingerprints. `scale` integer-upsamples (nearest). */
  def makeMotionFrame(idx: Int, k: Int, nFrames: Int, w: Int, h: Int,
      brightSteps: Int = 0, scale: Int = 1): BufferedImage = {
    val img = new BufferedImage(w * scale, h * scale,
      BufferedImage.TYPE_BYTE_INDEXED, websafePalette)
    val (ka, kb) = (2 + idx % 3, 1 + idx % 4)
    val rh = h / 3 + idx % 3
    val rw = w / 2 + (idx * 3) % 7
    val rx = w / 6
    // per-clip DISTINCT vertical speed (wraps): motion is what the
    // temporal grid fingerprints, so two clips must never share their
    // y(t) trajectory — speed 1 descends once, speed 5 hops 0,5,2,7,…
    val ry = if (nFrames <= 1) 0
      else ((k * (1 + idx % 5)) % nFrames) * (h - rh) / (nFrames - 1)
    var y = 0
    while (y < h * scale) {
      var x = 0
      while (x < w * scale) {
        val (sx, sy) = (x / scale, y / scale)
        val inRect = sx >= rx && sx < rx + rw && sy >= ry && sy < ry + rh
        val step =
          if (inRect) 4
          else ((sx * ka) / w + (sy * kb * 2) / h) % 4
        val v = math.min(5, step + brightSteps) * 51
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** A deterministic websafe-indexed frame: pixel (x,y) of frame `k` is
    * palette entry mix(seed,k,x,y) mod 216. */
  def makeFrame(seed: Long, k: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED,
      websafePalette)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = mix(seed * 31L + k, (y.toLong << 20) | x.toLong)
        raster.setSample(x, y, 0, ((v >>> 16) % 216).toInt.abs)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode frames + per-frame delays (centiseconds, GIF's native unit)
    * as an animated GIF via the JDK's ImageIO GIF writer — the encode
    * twin of [[Multimodal.GifVideoCodec]]. Public: the frame-exact
    * MultimodalSpec round-trips through it. */
  def encodeGif(frames: Seq[BufferedImage], delaysCs: Seq[Int]): Array[Byte] = {
    require(frames.nonEmpty && frames.size == delaysCs.size)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.zip(delaysCs).foreach { case (img, delayCs) =>
        val param = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = {
          val kids = tree.getChildNodes
          (0 until kids.getLength).iterator.map(kids.item)
            .collectFirst { case n: javax.imageio.metadata.IIOMetadataNode
              if n.getNodeName == "GraphicControlExtension" => n }
            .getOrElse {
              val n = new javax.imageio.metadata.IIOMetadataNode(
                "GraphicControlExtension")
              tree.appendChild(n); n
            }
        }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delayCs.toString)
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Re-container a WAV through javax.sound into AIFF/AU (same PCM
    * samples, different header + endianness owned by AudioSystem). */
  def transcodeAudio(wav: Array[Byte],
      typ: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in, typ, bos)
      bos.toByteArray
    } finally in.close()
  }

  /** Encode frames as an MJPEG-AVI (RIFF `AVI ` + full `hdrl` headers +
    * one JPEG per `00dc` chunk) — the encode twin of
    * [[Multimodal.AviMjpegCodec]]. Public: MultimodalSpec round-trips
    * through it. */
  def encodeAviMjpeg(frames: Seq[BufferedImage], usPerFrame: Long)
      : Array[Byte] = {
    require(frames.nonEmpty && usPerFrame > 0)
    def u32(v: Long): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] =
        if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      fcc(id) ++ u32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(typ) ++ children)
    val jpegs = frames.map { f =>
      // JPEG can't encode an indexed image directly; draw onto BGR first
      val rgb = new BufferedImage(f.getWidth, f.getHeight,
        BufferedImage.TYPE_3BYTE_BGR)
      val g = rgb.createGraphics(); g.drawImage(f, 0, 0, null); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(rgb, "jpg", bos)
      bos.toByteArray
    }
    val (w, h) = (frames.head.getWidth.toLong, frames.head.getHeight.toLong)
    val avih = u32(usPerFrame) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(frames.size.toLong) ++ u32(0) ++ u32(1) ++ u32(0) ++
      u32(w) ++ u32(h) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(usPerFrame) ++ u32(1000000L) ++ u32(0) ++
      u32(frames.size.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32((h << 16) | w)
    val strf = u32(40) ++ u32(w) ++ u32(h) ++
      Array[Byte](1, 0, 24, 0) ++ fcc("MJPG") ++ u32(w * h * 3) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.toArray.flatMap(j => chunk("00dc", j)))
    val payload = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ u32(payload.length.toLong) ++ payload
  }

  def main(args: Array[String]): Unit = {
    val root = new File(if (args.nonEmpty) args(0) else "fixtures/media")

    // ---- images: 10 valid PNGs of varying dims + 2 undecodable files
    val dims = Seq((5, 7), (8, 8), (16, 12), (32, 24), (3, 3),
      (64, 48), (10, 10), (24, 16), (9, 13), (20, 20))
    val imgFiles = dims.zipWithIndex.map { case ((w, h), i) =>
      val name = f"img_$i%02d.png"
      write(new File(root, s"img/$name"), makePng(i, w, h))
      name
    } ++ Seq(
      { // random bytes with a .png extension → ImageIO returns null → stub
        val junk = Array.tabulate[Byte](257)(i => (mix(99L, i.toLong) & 0xff).toByte)
        write(new File(root, "img/img_90_corrupt.png"), junk); "img_90_corrupt.png"
      },
      { // a valid PNG truncated mid-stream → decode throws → stub
        val full = makePng(91, 40, 40)
        write(new File(root, "img/img_91_truncated.png"), full.take(full.length / 3))
        "img_91_truncated.png"
      })

    // ---- perceptual-hash family: 6 structurally DISTINCT base images
    // + 3 perturbed near-dups (brightness shift, pixel noise, 2×
    // upscale) — the corpus q_phash/q_phash_neardup runs on. Structured
    // content (stripes+rectangle), NOT noise: pHash fingerprints
    // low-frequency structure.
    val phashFiles = (0 until 6).map { i =>
      val name = f"ph_$i%02d.png"
      write(new File(root, s"phash/$name"),
        makeStructuredPng(i, 48, 36))
      name
    } ++ Seq(
      { write(new File(root, "phash/ph_00_bright.png"),
          makeStructuredPng(0, 48, 36, brightness = 4))
        "ph_00_bright.png" },
      { write(new File(root, "phash/ph_01_noise.png"),
          makeStructuredPng(1, 48, 36, noiseAmp = 3))
        "ph_01_noise.png" },
      { write(new File(root, "phash/ph_02_up2x.png"),
          makeStructuredPng(2, 48, 36, scale = 2))
        "ph_02_up2x.png" })

    // ---- audio: 6 valid WAVs (rates × channel layouts) + 1 undecodable
    val clips = Seq((8000, 1, 400), (8000, 2, 320), (16000, 1, 800),
      (16000, 2, 512), (44100, 1, 2205), (44100, 2, 1024))
    val wavFiles = clips.zipWithIndex.map { case ((rate, ch, n), i) =>
      val name = f"clip_$i%02d.wav"
      write(new File(root, s"wav/$name"), makeWav(i, rate, ch, n))
      name
    } ++ Seq(
      // the OTHER javax.sound container formats ride the same
      // AudioSystem decode path — transcode two clips so AIFF and AU
      // are exercised with real fixtures, not just claimed
      {
        write(new File(root, "wav/clip_07.aiff"),
          transcodeAudio(makeWav(7, 16000, 1, 640),
            javax.sound.sampled.AudioFileFormat.Type.AIFF))
        "clip_07.aiff"
      },
      {
        write(new File(root, "wav/clip_08.au"),
          transcodeAudio(makeWav(8, 8000, 2, 256),
            javax.sound.sampled.AudioFileFormat.Type.AU))
        "clip_08.au"
      },
      {
        val junk = Array.tabulate[Byte](509)(i => (mix(77L, i.toLong) & 0xff).toByte)
        write(new File(root, "wav/clip_90_corrupt.wav"), junk); "clip_90_corrupt.wav"
      })

    // ---- audio-fingerprint family: 5 structurally DISTINCT tone
    // melodies + 3 perturbed near-dups (gain shift, 2× resample, AU
    // re-container) — the corpus q_audio_fp/q_audio_neardup runs on.
    // Structured content (tone sequences), NOT noise: the spectral
    // hash fingerprints band-time structure.
    val afpFiles = (0 until 5).map { i =>
      val name = f"afp_$i%02d.wav"
      write(new File(root, s"afp/$name"), makeToneWav(i, 8000))
      name
    } ++ Seq(
      { write(new File(root, "afp/afp_00_gain.wav"),
          makeToneWav(0, 8000, gain = 0.2))
        "afp_00_gain.wav" },
      { write(new File(root, "afp/afp_01_rs2x.wav"),
          makeToneWav(1, 16000))
        "afp_01_rs2x.wav" },
      { write(new File(root, "afp/afp_02_au.au"),
          transcodeAudio(makeToneWav(2, 8000),
            javax.sound.sampled.AudioFileFormat.Type.AU))
        "afp_02_au.au" })

    // ---- video: 5 valid animated GIFs (dims × frame counts × delay
    // patterns, incl. a single-frame clip and mixed per-frame delays)
    // + 2 undecodable files exercising the stub fallback
    val gifSpecs = Seq(
      (8, 6, Seq(40, 40, 40)),          // 1.2 s, uniform
      (16, 12, Seq(30, 30, 30, 30, 30)),// 1.5 s
      (5, 5, Seq(0)),                   // single frame, zero duration
      (12, 8, Seq(20, 40, 60, 80)),     // 2.0 s, mixed delays
      (10, 10, Seq(25, 25, 25, 25, 25, 25))) // 1.5 s
    val gifFiles = gifSpecs.zipWithIndex.map { case ((w, h, delays), i) =>
      val name = f"vid_$i%02d.gif"
      val frames = delays.indices.map(k => makeFrame(i * 5309L + 7L, k, w, h))
      write(new File(root, s"gif/$name"), encodeGif(frames, delays))
      name
    } ++ Seq(
      { // random bytes with a .gif extension → reader fails → stub
        val junk = Array.tabulate[Byte](509)(i => (mix(55L, i.toLong) & 0xff).toByte)
        write(new File(root, "gif/vid_90_corrupt.gif"), junk); "vid_90_corrupt.gif"
      },
      { // a valid GIF truncated mid-stream → decode throws → stub
        val full = encodeGif(
          (0 until 3).map(k => makeFrame(991L, k, 14, 14)), Seq(30, 30, 30))
        write(new File(root, "gif/vid_91_truncated.gif"), full.take(full.length / 4))
        "vid_91_truncated.gif"
      })

    // ---- video, second container: 4 valid MJPEG-AVIs (incl. a
    // non-ms-aligned 30 fps rate and a single-frame clip) + 2 files
    // exercising the stub fallback (bad JPEG payload; truncated RIFF)
    val aviSpecs = Seq(
      (8, 6, 3, 400000L),    // 3 × 400 ms = 1.2 s
      (16, 12, 5, 333333L),  // 30 fps-ish: µs timing not ms-aligned
      (12, 8, 1, 1000000L),  // single frame, 1 s
      (10, 10, 4, 250000L))  // exactly one frame per sample period
    val aviFiles = aviSpecs.zipWithIndex.map { case ((w, h, n, us), i) =>
      val name = f"avi_$i%02d.avi"
      val frames = (0 until n).map(k => makeFrame(i * 7121L + 3L, k, w, h))
      write(new File(root, s"avi/$name"), encodeAviMjpeg(frames, us))
      name
    } ++ Seq(
      { // valid container, garbage JPEG payload → frame decode fails → stub
        val good = encodeAviMjpeg(
          (0 until 2).map(k => makeFrame(881L, k, 8, 8)), 400000L)
        val bad = good.clone()
        // find the first 00dc body and trash it
        val idx = good.indices.find(p => p + 4 <= good.length - 4 &&
          good(p) == '0' && good(p + 1) == '0' && good(p + 2) == 'd' &&
          good(p + 3) == 'c').get
        (idx + 8 until math.min(idx + 48, bad.length)).foreach { p =>
          bad(p) = (mix(13L, p.toLong) & 0xff).toByte
        }
        write(new File(root, "avi/avi_90_corrupt.avi"), bad)
        "avi_90_corrupt.avi"
      },
      { // truncated mid-chunk → parse rejects → stub
        val full = encodeAviMjpeg(
          (0 until 3).map(k => makeFrame(883L, k, 14, 14)), 400000L)
        write(new File(root, "avi/avi_91_truncated.avi"),
          full.take(full.length / 2))
        "avi_91_truncated.avi"
      })

    // ---- video-fingerprint family: 5 structurally DISTINCT motion
    // clips (different gradients, rect sizes, all with vertical motion)
    // + 4 perturbed near-dups: one-lattice-step brightness (pure DC),
    // 2× re-timing (same frames, doubled delays — the proportional-
    // slicing invariance), 2× spatial upscale, and an MJPEG-AVI
    // re-encode of the same frames (lossy cross-container)
    val nMotion = 8
    def motionFrames(idx: Int, bright: Int = 0, scale: Int = 1) =
      (0 until nMotion).map(k =>
        makeMotionFrame(idx, k, nMotion, 48, 36, bright, scale))
    val vfpFiles = (0 until 5).map { i =>
      val name = f"vf_$i%02d.gif"
      write(new File(root, s"vfp/$name"),
        encodeGif(motionFrames(i), Seq.fill(nMotion)(10)))
      name
    } ++ Seq(
      { write(new File(root, "vfp/vf_00_bright.gif"),
          encodeGif(motionFrames(0, bright = 1), Seq.fill(nMotion)(10)))
        "vf_00_bright.gif" },
      { write(new File(root, "vfp/vf_01_slow.gif"),
          encodeGif(motionFrames(1), Seq.fill(nMotion)(20)))
        "vf_01_slow.gif" },
      { write(new File(root, "vfp/vf_02_up2x.gif"),
          encodeGif(motionFrames(2, scale = 2), Seq.fill(nMotion)(10)))
        "vf_02_up2x.gif" },
      { write(new File(root, "vfp/vf_03_avi.avi"),
          encodeAviMjpeg(motionFrames(3), 100000L))
        "vf_03_avi.avi" })

    // ---- manifests: round-trip the bytes just written through the SAME
    // decode-or-stub paths the queries use, so manifest == query output
    def bytesOf(sub: String, name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(new File(root, s"$sub/$name").toPath)

    val imgRows = imgFiles.sorted.map { name =>
      val b = bytesOf("img", name)
      val d = Multimodal.ImageIoCodec.decodeImage(b).getOrElse(
        Multimodal.Decoded(0L, 8, 8, 3, Multimodal.StubCodec.decodeImage(b, 8, 8, 3)))
      ImageSummary(name, d.width, d.height, d.channels,
        Multimodal.pixelChecksum(d.pixels))
    }
    val wavRows = wavFiles.sorted.map { name =>
      val b = bytesOf("wav", name)
      val d = Multimodal.WavCodec.decodeAudio(b)
        .getOrElse(Multimodal.StubCodec.decodeAudio(b))
      AudioSummary(name, d.sample_rate, d.channels, d.n_frames,
        Multimodal.sampleChecksum(d.samples))
    }
    // everyMs must match the declared q_frame_sample sampling period;
    // the stub fallback's duration convention (length·10 ms) mirrors
    // Multimodal.readMedia's meta.durationMs
    val gifRows = gifFiles.sorted.flatMap { name =>
      val b = bytesOf("gif", name)
      Multimodal.sampleClip(b, b.length * 10L, everyMs = 250L)
        .map { case (offMs, px) => FrameSummary(name, offMs,
          px.length.toLong, Multimodal.pixelChecksum(px)) }
    }
    val aviRows = aviFiles.sorted.flatMap { name =>
      val b = bytesOf("avi", name)
      Multimodal.sampleClip(b, b.length * 10L, everyMs = 250L)
        .map { case (offMs, px) => FrameSummary(name, offMs,
          px.length.toLong, Multimodal.pixelChecksum(px)) }
    }

    val phashRows = phashFiles.sorted.map { name =>
      val b = bytesOf("phash", name)
      val d = Multimodal.ImageIoCodec.decodeImage(b).getOrElse(
        Multimodal.Decoded(0L, 8, 8, 3,
          Multimodal.StubCodec.decodeImage(b, 8, 8, 3)))
      (name, Multimodal.perceptualHash(d.pixels, d.width, d.height,
        d.channels))
    }

    val afpRows = afpFiles.sorted.map { name =>
      val b = bytesOf("afp", name)
      val d = Multimodal.WavCodec.decodeAudio(b)
        .getOrElse(Multimodal.StubCodec.decodeAudio(b))
      (name, Multimodal.audioFingerprint(d))
    }

    val vfpRows = vfpFiles.sorted.map { name =>
      val b = bytesOf("vfp", name)
      (name, Multimodal.videoFingerprint(b, b.length * 10L))
    }

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    phashRows.toDF("file_name", "phash").coalesce(1).write
      .mode("overwrite")
      .parquet(new File(root, "manifest_phash").getPath)
    afpRows.toDF("file_name", "afp").coalesce(1).write
      .mode("overwrite")
      .parquet(new File(root, "manifest_afp").getPath)
    vfpRows.toDF("file_name", "vfp").coalesce(1).write
      .mode("overwrite")
      .parquet(new File(root, "manifest_vfp").getPath)
    imgRows.toDS().coalesce(1).write.mode("overwrite")
      .parquet(new File(root, "manifest_img").getPath)
    wavRows.toDS().coalesce(1).write.mode("overwrite")
      .parquet(new File(root, "manifest_wav").getPath)
    gifRows.toDS().coalesce(1).write.mode("overwrite")
      .parquet(new File(root, "manifest_gif").getPath)
    aviRows.toDS().coalesce(1).write.mode("overwrite")
      .parquet(new File(root, "manifest_avi").getPath)
    spark.stop()
    println(s"wrote ${imgFiles.size} images + ${wavFiles.size} clips + " +
      s"${gifFiles.size} gifs + ${aviFiles.size} avis + manifests " +
      s"under $root")
  }
}
