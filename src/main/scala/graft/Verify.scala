package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Schema-drift canary: a testdata regeneration that changes a physical
    // type (it happened: events.ts went TIMESTAMP(NANOS) → timestamp[us] in
    // r5) must produce ONE loud diagnostic line here, not N opaque query
    // failures. Print every table's read schema and force a full-width
    // 1-row read; separately prove the shared ts_us derivation analyzes.
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName.stripSuffix(".parquet"))
      .sorted.foreach { name =>
        try {
          val df = graft.analytics.Tables(spark, sfDir, name)
          df.limit(1).collect()
          System.err.println(s"[canary] $name: " + df.schema.fields
            .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
        } catch { case e: Throwable => System.err.println(
          s"[canary] SCHEMA DRIFT? table $name unreadable: ${e.getMessage}") }
      }
    try graft.analytics.Tables.withEpochMicros(
        graft.analytics.Tables(spark, sfDir, "events"))
      .select("ts_us").limit(1).collect()
    catch { case e: Throwable => System.err.println(
      s"[canary] SCHEMA DRIFT? events.ts_us derivation broken: ${e.getMessage}") }
    // Builder-side iteration aid (same contract as Bench): restrict to a
    // comma-separated subset; unknown names fail loud. Driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown SPARK_GRAFT_ONLY names: $unknown")
    }
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach {
      case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
