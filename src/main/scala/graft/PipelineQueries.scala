package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{ConfigLoader, PipelineParams}
import graft.pipeline.PipelineRunner

/** Declared queries that exercise the MEDALLION PIPELINE path end-to-end
  * rather than a bare operator: each invocation stages the testdata table
  * as a raw source directory, writes a `dp_config_template.json`, and runs
  * the full bronze → silver → gold flow before reading the result back
  * from the catalog. This is the reference's whole identity — config-driven
  * declarative tables (`01_bronze_ingestion.py:92-97`) — so the oracle row
  * proves the pipeline plumbing preserves operator semantics bit-exactly,
  * not just that the operators do.
  */
object PipelineQueries {

  private val invocation = new AtomicInteger(0)

  // the staged raw-source parquet is IDENTICAL across invocations on the
  // same testdata dir (a pure copy of the documents table), so stage it
  // once per dir and symlink it into each run's fresh workspace — the
  // bench harness invokes the query several times per session and would
  // otherwise pay a full table write per run. Checkpoints, catalogs, and
  // table stores stay per-invocation (a reused checkpoint would turn run
  // 2 into an incremental no-op ingest).
  private val stagedSrc =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private def stageDocuments(s: SparkSession, dir: String)
      : java.nio.file.Path =
    stagedSrc.computeIfAbsent(dir, _ => {
      val p = Files.createTempDirectory(
        s"graft_goldsrc_${ProcessHandle.current().pid()}")
      analytics.Tables(s, dir, "documents")
        .write.parquet(s"$p/documents")
      p.resolve("documents")
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- [REF+EXT]: config-declared gold layer. The documents table rides
    //    the real pipeline (streaming bronze ingest with checkpoint, PK-
    //    dedup silver, curation gold with versioned publish + run lock),
    //    then the gold TABLE is compared against the same DuckDB oracle as
    //    q_curation — the pipeline path must be invisible in the result.
    "q_gold_curation" -> ((s, dir) => {
      // fresh workspace + catalog names per invocation: the bench harness
      // runs each query several times in one session, and a reused
      // checkpoint would turn run 2 into an incremental no-op ingest
      val run = s"goldq_${ProcessHandle.current().pid()}_" +
        s"${invocation.incrementAndGet()}"
      val root = Files.createTempDirectory(s"graft_$run").toString
      Files.createDirectories(Paths.get(s"$root/src"))
      Files.createSymbolicLink(Paths.get(s"$root/src/documents"),
        stageDocuments(s, dir))
      Files.write(Paths.get(s"$root/src/dp_config_template.json"),
        """{"documents": {
          |  "raw_file_format": "parquet",
          |  "unique_primary_key": ["doc_id"],
          |  "gold": {"curation": {"id_col": "doc_id", "text_col": "text",
          |                        "lang_col": "lang"}}
          |}}""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val params = PipelineParams(sourceLocation = s"$root/src",
        catalogName = run)
      val runner = new PipelineRunner(s, params, s"$root/store")
      runner.run(ConfigLoader.load(s, params.sourceLocation))
      s.table(params.goldFqn("documents"))
        .select(col("doc_id"), col("lang"),
          round(col("quality"), 6).as("quality"))
        .orderBy(col("doc_id"))
    })
  )

  /** Same oracle as `q_curation`: the pipeline wrapping (audit columns,
    * PK dedup over unique ids, versioned publish) must not change the
    * curated result. */
  def oracleSql: Map[String, String] = Map(
    "q_gold_curation" -> LlmQueries.oracleSql("q_curation"))
}
