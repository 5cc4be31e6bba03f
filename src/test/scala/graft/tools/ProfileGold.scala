package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.{ConfigLoader, PipelineParams}
import graft.pipeline.PipelineRunner

/** Stage-level timing of the q_gold_curation path at a given sf dir:
  * stage source, then bronze / silver / gold separately. */
object ProfileGold {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round")
      val root = Files.createTempDirectory("graft_goldprof").toString
      t("stage") {
        graft.analytics.Tables(spark, dir, "documents")
          .write.parquet(s"$root/src/documents")
      }
      Files.write(Paths.get(s"$root/src/dp_config_template.json"),
        """{"documents": {
          |  "raw_file_format": "parquet",
          |  "unique_primary_key": ["doc_id"],
          |  "gold": {"curation": {"id_col": "doc_id", "text_col": "text",
          |                        "lang_col": "lang"}}
          |}}""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val params = PipelineParams(sourceLocation = s"$root/src",
        catalogName = s"goldprof$round")
      val runner = new PipelineRunner(spark, params, s"$root/store")
      val entities = ConfigLoader.load(spark, params.sourceLocation)
      t("schemas") { runner.ensureSchemas(params.softDeletesEnabled) }
      t("bronze") { entities.foreach { case (e, c) => runner.runBronze(e, c) } }
      t("silver") { entities.foreach { case (e, c) => runner.runSilver(e, c) } }
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `${params.goldSchema}`")
      t("gold") { entities.foreach { case (e, c) => runner.runGold(e, c) } }
    }
    spark.stop()
  }
}
