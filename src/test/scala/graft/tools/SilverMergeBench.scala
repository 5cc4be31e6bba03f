package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.{ConfigLoader, PipelineParams}
import graft.pipeline.PipelineRunner

/** Write-volume + wall-clock comparison of the three silver strategies
  * (SCALE.md evidence): full recompute, bucketed copy-on-write merge,
  * merge-on-read delta append. Per mode: run1 builds silver from the
  * staged documents table, run2 merges a 10-row update batch; we report
  * run2's wall time and the BYTES IT WROTE under the silver dir (files
  * absent from the post-run1 snapshot) — the number that scales with
  * table size for full (O(table)), bucket size for copy-on-write
  * (O(touched buckets)), and batch size for merge-on-read (O(batch)).
  *
  * Usage: Test/runMain graft.tools.SilverMergeBench [sfDir] */
object SilverMergeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def files(root: String): Map[String, Long] = {
      val base = Paths.get(root)
      if (!Files.exists(base)) Map.empty
      else {
        val s = Files.walk(base)
        try s.filter(Files.isRegularFile(_)).toArray.toSeq
          .map(_.asInstanceOf[java.nio.file.Path])
          .map(p => p.toString -> Files.size(p)).toMap
        finally s.close()
      }
    }

    val modes = Seq(
      ("full", "copy_on_write", "full-recompute"),
      ("incremental", "copy_on_write", "cow-bucketed"),
      ("incremental", "merge_on_read", "mor-delta"))
    modes.foreach { case (mode, merge, label) =>
      val root = Files.createTempDirectory(s"graft_smb_$label").toString
      graft.analytics.Tables(spark, dir, "documents")
        .write.parquet(s"$root/src/documents")
      Files.write(Paths.get(s"$root/src/dp_config_template.json"),
        s"""{"documents": {
           |  "raw_file_format": "parquet",
           |  "unique_primary_key": ["doc_id"],
           |  "silver_mode": "$mode",
           |  "silver_merge": "$merge",
           |  "silver_buckets": 32
           |}}""".stripMargin.getBytes(StandardCharsets.UTF_8))
      def runner(clock: String) = new PipelineRunner(spark,
        PipelineParams(sourceLocation = s"$root/src",
          catalogName = s"smb_$label".replace("-", "_"),
          fixedIngestedAt = Some(java.sql.Timestamp.valueOf(clock))),
        s"$root/store")
      val entities = ConfigLoader.load(spark, s"$root/src")
      def timed[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val t1 = timed(runner("2024-02-01 00:00:00").run(entities))
      val silverDir = s"$root/store/silver/documents"
      val before = files(silverDir)

      // 10-row update batch against existing PKs
      val docs = spark.read.parquet(s"$root/src/documents")
      docs.orderBy($"doc_id").limit(10)
        .withColumn("text", concat(lit("updated: "), col("text")))
        .write.mode("append").parquet(s"$root/src/documents")
      val t2 = timed(runner("2024-03-01 00:00:00").run(entities))
      val after = files(silverDir)
      val newBytes = after.filterNot { case (p, _) => before.contains(p) }
        .values.sum
      val fqn = s"`smb_${label.replace("-", "_")}_silver`.`silver_documents`"
      val rows = spark.table(fqn).count()
      println(f"[smb] $label%-15s run1=${t1}%6.1fs run2=${t2}%6.1fs " +
        f"run2_wrote=${newBytes / 1024}%8d KB rows=$rows")
    }
    spark.stop()
  }
}
