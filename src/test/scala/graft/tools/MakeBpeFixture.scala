package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `fixtures/bpe_merges.csv` — the trained BPE merge tables for
  * the driver-verified corpus sizes, keyed by the documents row count
  * (`docs_n`) so one committed file serves every scale factor. The
  * q_bpe_encode gate query trains at runtime and REQUIRES its merges to
  * equal this fixture (reproducibility pin), and the DuckDB oracle
  * replays encoding from the same fixture in recursive SQL — together
  * they give the BPE path a FULL value-level oracle (training pinned by
  * equality, encoding replayed independently), retiring the rows-only
  * check. Symbols are [a-z0-9]+ and the `</w>` sentinel — CSV-safe
  * unquoted. Re-run after changing Bpe.train or the normalization. */
object MakeBpeFixture {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val out = "fixtures/bpe_merges.csv"
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w = new java.io.PrintWriter(out, "UTF-8")
    // corpus key = (row count, total chars): row count alone is NOT
    // unique across the driver's scale factors (sf0.001 and sf0.01
    // both hold 500 documents)
    w.println("docs_n,chars_n,rank,p1,p2")
    dirs.foreach { dir =>
      val docs = graft.analytics.Tables(spark, dir, "documents")
      val n = docs.count()
      val chars = docs.agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text"))))
        .collect()(0).getLong(0)
      val model = graft.text.Bpe.train(docs, "text", numMerges = 200)
      model.merges.zipWithIndex.foreach { case ((p1, p2), r) =>
        w.println(s"$n,$chars,$r,$p1,$p2")
      }
      println(s"[fixture] $dir: docs_n=$n chars_n=$chars " +
        s"merges=${model.merges.size}")
    }
    w.close()
    spark.stop()
  }
}
