package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator (SCALE.md evidence): builds an sf1-class
  * copy of the driver testdata by replicating `/root/testdata/sf0.1` K×
  * (default 10) with consistent key-space shifts, so every fact/dim join
  * fans out exactly like a larger TPC-H-ish world would:
  *
  *  - dimension tables (region, nation) copy as-is; entity tables shift
  *    their PKs by `copy * maxKey` and every FK shifts by the SAME
  *    offset, preserving join selectivity and per-key fan-out;
  *  - `documents.text` is token-ROTATED per copy (rotate word order by
  *    7·copy positions): token/vocab/length distributions are preserved
  *    for corpus statistics, while order-sensitive shingles change almost
  *    entirely, so copies do NOT become near-duplicates of each other
  *    (blind 10× duplication would superlinearly inflate the near-dup
  *    pair count and poison the scaling measurement);
  *  - `embeddings.embedding` gets deterministic per-copy noise (±1%) so
  *    ANN structure scales like more data, not 10 co-located points;
  *  - `events` shifts event/user ids (10× users, same per-user timeline
  *    shape).
  *
  * Deterministic (hash-derived perturbations, no RNG state). Output goes
  * to the given dir (default /tmp/graft_sf1) — NEVER under /root/testdata,
  * which is read-only driver ground truth.
  *
  *   sbt "Test/runMain graft.tools.MakeScaledTestdata [outDir] [K]"
  */
object MakeScaledTestdata {

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = graft.analytics.GraftSession.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, out, k)
    spark.stop()
  }

  /** Session-reusing form: other tools ([[GraphIterBench]]) generate
    * worlds on THEIR session — main's own stop() must not kill it. */
  def generate(spark: SparkSession, out: String, k: Int): Unit = {
    val src = "/root/testdata/sf0.1"

    def read(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame, parts: Int = 4): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    /** Replicate k× with `shifts` applied per copy (col -> offset cap). */
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val copies = explode(sequence(lit(0), lit(k - 1))).as("_copy")
      val withCopy = df.withColumn("_copy", copies)
      shifts.foldLeft(withCopy) { case (d, (c, cap)) =>
        d.withColumn(c, col(c) + col("_copy") * cap)
      }
    }

    // dims as-is
    write("region", read("region"), 1)
    write("nation", read("nation"), 1)

    val (cust, supp, part0, orders0, li) =
      (read("customer"), read("supplier"), read("part"),
        read("orders"), read("lineitem"))
    val (cMax, sMax, pMax, oMax) = (maxOf(cust, "c_custkey"),
      maxOf(supp, "s_suppkey"), maxOf(part0, "p_partkey"),
      maxOf(orders0, "o_orderkey"))
    write("customer", replicate(cust, Map("c_custkey" -> cMax)).drop("_copy"))
    write("supplier", replicate(supp, Map("s_suppkey" -> sMax)).drop("_copy"), 1)
    write("part", replicate(part0, Map("p_partkey" -> pMax)).drop("_copy"))
    write("orders", replicate(orders0,
      Map("o_orderkey" -> oMax, "o_custkey" -> cMax)).drop("_copy"))
    write("lineitem", replicate(li, Map("l_orderkey" -> oMax,
      "l_partkey" -> pMax, "l_suppkey" -> sMax)).drop("_copy"), 8)

    val ev = read("events")
    write("events", replicate(ev, Map(
      "event_id" -> maxOf(ev, "event_id"),
      "user_id" -> maxOf(ev, "user_id"))).drop("_copy"), 8)

    // documents: rotate tokens by 7·copy (mod n) — same vocabulary and
    // length profile, near-disjoint order-sensitive shingle sets
    val docs = read("documents")
    val dMax = maxOf(docs, "doc_id")
    val toks = split(trim(col("text")), "\\s+")
    val n = greatest(size(toks), lit(1))
    val shift = pmod(col("_copy") * 7, n) + 1 // 1-based slice start
    val rotated = array_join(concat(
      slice(toks, shift, n - shift + lit(1)),
      slice(toks, lit(1), shift - lit(1))), " ")
    write("documents",
      replicate(docs, Map("doc_id" -> dMax))
        .withColumn("text",
          when(col("_copy") === 0, col("text")).otherwise(rotated))
        .withColumn("n_chars", length(col("text")))
        .drop("_copy"))

    // embeddings: ±1% deterministic per-copy noise, copy 0 untouched
    val emb = read("embeddings")
    val vMax = maxOf(emb, "vec_id")
    // keep the element type float32 — the similarity kernels take
    // Array[Float], and bare arithmetic would promote to double
    val noisy = transform(col("embedding"), (v: Column, d: Column) =>
      when(col("_copy") === 0, v).otherwise(
        (v + (pmod(xxhash64(col("vec_id"), col("_copy"), d), lit(2000))
          .cast("double") / 1000.0d - 1.0d) * 0.01d).cast("float")))
    write("embeddings",
      replicate(emb, Map("vec_id" -> vMax))
        .withColumn("embedding", noisy)
        .drop("_copy"))

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      println(s"[sf1] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
  }
}
