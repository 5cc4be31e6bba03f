package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Declared multimodal queries: decode the COMMITTED media fixtures
  * (`fixtures/media/`, written once by [[graft.tools.MakeMediaFixtures]])
  * and emit per-file decode summaries. The fixture manifests are parquet,
  * so DuckDB oracles them via `read_parquet` on the absolute path — these
  * are full rows+schema+hash CORRECTNESS rows, not rows-only checks.
  *
  * The corpus is deliberately mixed: valid PNG/WAV files decode through
  * the REAL JDK codecs (ImageIO / javax.sound), corrupt members fall back
  * to the deterministic stub — so the fallback path is oracle-checked too.
  *
  * Scale shape: binaryFile scan → size-balanced repartition → batched
  * per-partition decode → tiny summary rows. At 100 TB the same plan
  * holds — the decode is embarrassingly parallel, the repartition spreads
  * giant blobs, and only (name, dims, checksum) rows ever shuffle.
  */
object MultimodalQueries {

  /** Fixture root: `GRAFT_MEDIA_DIR` when set (for checkouts elsewhere /
    * other cwds), else repo-relative when the cwd is the repo (sbt
    * runMain), else this environment's canonical checkout path. */
  private[graft] def mediaRoot: String =
    sys.env.get("GRAFT_MEDIA_DIR").getOrElse {
      val local = new java.io.File("fixtures/media")
      if (local.isDirectory) local.getAbsolutePath
      else "/root/repo/fixtures/media"
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- [EXT] multimodal: image decode (real ImageIO + stub fallback)
    "q_image_decode" -> ((s, _) => {
      import s.implicits._
      val media = Multimodal.readMedia(s, s"$mediaRoot/img", "*.png")
        .as[Multimodal.MediaRow]
      Multimodal.imageSummaries(Multimodal.balanceBySize(media.toDF, 4)
          .as[Multimodal.MediaRow])
        .toDF().orderBy(col("file_name"))
    }),

    // -- [EXT] multimodal: audio decode (real javax.sound + stub fallback)
    "q_audio_decode" -> ((s, _) => {
      import s.implicits._
      // all three javax.sound containers (WAV/AIFF/AU) through one
      // decode path
      val media = Multimodal.readMedia(s, s"$mediaRoot/wav",
          "*.{wav,aiff,au}")
        .as[Multimodal.MediaRow]
      Multimodal.audioSummaries(Multimodal.balanceBySize(media.toDF, 4)
          .as[Multimodal.MediaRow])
        .toDF().orderBy(col("file_name"))
    }),

    // -- [EXT] multimodal: video frame sampling — REAL animated-GIF
    //    decode (the JDK ImageIO GIF plugin: true multi-frame container,
    //    per-frame GCE delays — Multimodal.GifVideoCodec), corrupt
    //    members exercising the deterministic stub fallback. Plumbing:
    //    binaryFile scan → size-balanced repartition → batched
    //    per-partition flatMap (one row per sampled frame) → per-frame
    //    checksum. Full rows+schema+hash oracle vs the committed
    //    manifest (the q_image_decode promotion pattern).
    "q_frame_sample" -> ((s, _) => {
      import s.implicits._
      // BOTH real containers ride one decode pass: animated GIF and
      // MJPEG-AVI (magic-dispatched per clip inside sampleClip)
      val media = Multimodal.readMedia(s, s"$mediaRoot/gif", "*.gif",
          kind = "video")
        .unionByName(Multimodal.readMedia(s, s"$mediaRoot/avi", "*.avi",
          kind = "video"))
        .as[Multimodal.MediaRow]
      Multimodal.frameSummaries(
        Multimodal.balanceBySize(media.toDF, 4).as[Multimodal.MediaRow],
        everyMs = 250L)
        .toDF().orderBy(col("file_name"), col("frame_ms"))
    }),

    // -- [EXT] multimodal: perceptual hashes (DCT pHash) over the
    //    structured fixture corpus — real ImageIO decode, real DCT
    //    math; the manifest pins the deterministic 64-bit signatures
    "q_phash" -> ((s, _) => {
      import s.implicits._
      val media = Multimodal.readMedia(s, s"$mediaRoot/phash", "*.png")
        .as[Multimodal.MediaRow]
      Multimodal.imagePhashes(Multimodal.balanceBySize(media.toDF, 4)
          .as[Multimodal.MediaRow])
        .toDF().orderBy(col("file_name"))
    }),

    // -- [EXT] multimodal: IMAGE near-dup pairs — pHash signatures
    //    through the Manku banded-Hamming join (DedupOps.hammingPairs,
    //    the SimHash machinery generalized to any 64-bit signature).
    //    The oracle recomputes the pairs INDEPENDENTLY in DuckDB from
    //    the pinned manifest hashes (xor + bit_count), so the join
    //    logic — not just the hashes — is externally verified.
    "q_phash_neardup" -> ((s, _) => {
      import s.implicits._
      val media = Multimodal.readMedia(s, s"$mediaRoot/phash", "*.png")
        .as[Multimodal.MediaRow]
      val hashes = Multimodal.imagePhashes(
        Multimodal.balanceBySize(media.toDF, 4)
          .as[Multimodal.MediaRow]).toDF()
      graft.dedup.DedupOps.hammingPairs(hashes, "file_name", "phash",
          maxDist = 10)
        .orderBy(col("id_a"), col("id_b"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_phash" ->
      s"""SELECT file_name, phash
         |FROM read_parquet('$mediaRoot/manifest_phash/*.parquet')
         |ORDER BY file_name""".stripMargin,
    // independent pair recompute from the pinned hashes: brightness/
    // noise variants at distance 0, the 2x upscale at 4, every
    // structurally distinct pair beyond the threshold
    "q_phash_neardup" ->
      s"""WITH h AS (SELECT file_name, phash
         |  FROM read_parquet('$mediaRoot/manifest_phash/*.parquet'))
         |SELECT a.file_name AS id_a, b.file_name AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS dist
         |FROM h a JOIN h b ON a.file_name < b.file_name
         |WHERE bit_count(xor(a.phash, b.phash)) <= 10
         |ORDER BY id_a, id_b""".stripMargin,
    "q_image_decode" ->
      s"""SELECT file_name, width, height, channels, pixel_checksum
         |FROM read_parquet('$mediaRoot/manifest_img/*.parquet')
         |ORDER BY file_name""".stripMargin,
    "q_audio_decode" ->
      s"""SELECT file_name, sample_rate, channels, n_frames, sample_checksum
         |FROM read_parquet('$mediaRoot/manifest_wav/*.parquet')
         |ORDER BY file_name""".stripMargin,
    "q_frame_sample" ->
      s"""SELECT file_name, frame_ms, n_values, frame_checksum
         |FROM read_parquet('$mediaRoot/manifest_gif/*.parquet')
         |UNION ALL
         |SELECT file_name, frame_ms, n_values, frame_checksum
         |FROM read_parquet('$mediaRoot/manifest_avi/*.parquet')
         |ORDER BY file_name, frame_ms""".stripMargin)
}
