package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the r13 dim-path fix in [[graft.pipeline.GoldJoinOps]]:
  * per dim micro-batch, the OLD path ran a keep-latest window over the
  * ENTIRE fact store before the touched-keys semi-join (O(store)
  * shuffle per batch); the NEW path ([[GoldJoinOps.affectedFacts]])
  * restricts BEFORE the window via the two-phase semi-join. Builds a
  * stream-mart fact store from the orders table (3 CDC batches so PKs
  * carry history), then times both reads for a small touched-key set,
  * min-of-N. */
object DimRestrictBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.analytics.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.GoldJoinOps
    import graft.pipeline.GoldJoinOps.{StreamDim, StreamStar}
    import spark.implicits._

    val star = StreamStar(
      pkCols = Seq("o_orderkey"),
      dims = Seq(StreamDim("customer", Seq("o_custkey" -> "c_custkey"))),
      select = Seq("o_orderkey", "o_totalprice", "c_name AS customer"))
    val root = java.nio.file.Files.createTempDirectory("dimrestrict")
    val storeDir = root.resolve("store").toString
    val orders = graft.analytics.Tables(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customer = graft.analytics.Tables(spark, dir, "customer")
      .select($"c_custkey", $"c_name")
    // dim first (inner star), then 3 fact CDC batches: base + two
    // update waves -> the store holds ~1.4x history rows
    val dimMem = MemoryStream[(Long, String)](spark)
    val dimQ = GoldJoinOps.dimSink(
        dimMem.toDF.toDF("c_custkey", "c_name"), "customer", star,
        storeDir, root.resolve("cp_dim").toString).start()
    dimMem.addData(customer.as[(Long, String)].collect().toIndexedSeq: _*)
    dimQ.processAllAvailable(); dimQ.stop()
    val factMem = MemoryStream[(Long, Long, Double)](spark)
    val factQ = GoldJoinOps.factSink(
        factMem.toDF.toDF("o_orderkey", "o_custkey", "o_totalprice"),
        star, storeDir, root.resolve("cp_fact").toString).start()
    def feed(df: DataFrame): Unit = {
      factMem.addData(df.as[(Long, Long, Double)].collect().toIndexedSeq: _*)
      factQ.processAllAvailable()
    }
    feed(orders)
    feed(orders.filter($"o_orderkey" % 5 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 1.0))
    feed(orders.filter($"o_orderkey" % 7 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 2.0))
    factQ.stop()
    val genMarker = new java.io.File(s"$storeDir/facts/_gen")
    val gen = if (genMarker.isFile)
      java.nio.file.Files.readString(genMarker.toPath).trim else "0"
    val factsDir = s"$storeDir/facts/g$gen"
    println(s"[dimbench] fact store rows: " +
      s"${spark.read.parquet(factsDir).count()} (gen $gen)")

    val touched = customer.limit(10).select($"c_custkey".as("o_custkey"))
      .localCheckpoint(true)
    val d = star.dims.head
    def time(label: String)(body: => Long): Unit = {
      val ts = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = body
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"[dimbench] $label: min ${ts.map(_._1).min}%.3f s " +
        f"(runs ${ts.map(t => f"${t._1}%.3f").mkString("/")}, " +
        s"rows ${ts.head._2})")
    }
    // OLD shape: keep-latest window over the ENTIRE store, then the
    // touched-keys semi-join (what dimSink ran before r13)
    import org.apache.spark.sql.expressions.Window
    time("old full-store window") {
      val raw = spark.read.option("mergeSchema", "true")
        .parquet(factsDir)
      val w = Window.partitionBy($"o_orderkey")
        .orderBy(col("_sj_seq").desc,
          xxhash64(raw.columns.map(c => col(s"`$c`")).toSeq: _*).desc)
      raw.withColumn("_rn", row_number().over(w))
        .filter($"_rn" === 1).drop("_rn")
        .filter(col("_sj_live")).drop("_sj_seq", "_sj_live")
        .join(broadcast(touched), Seq("o_custkey"), "left_semi")
        .count()
    }
    time("new two-phase restrict") {
      GoldJoinOps.affectedFacts(spark, storeDir, star, d, touched)
        .get.count()
    }
    spark.stop()
  }
}
