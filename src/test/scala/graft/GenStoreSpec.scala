package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[GenStore.compact]]'s BYTES-OR-FILES trigger (the r12-verdict
  * scale item): the full-rewrite path costs O(live rows) every time it
  * runs, and size-scaled multi-file appends over-count the file-based
  * "batch" trigger — a data-sized store past the file threshold on
  * every append would full-rewrite per append (quadratic). The gate
  * requires bytes to have DOUBLED since the last rewrite (size-doubling
  * amortization), with a 64×-threshold file-count backstop. Tiny
  * dashboard-grain stores double trivially, so their cadence is
  * unchanged — both regimes pinned here, plus the crash-safe
  * [[StoreMarkers]] atomic-replace discipline the triggers depend on. */
class GenStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.SparkTestSession.spark

  private def mkStore(root: String): GenStore = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    new GenStore(fs, root, _ => ())
  }

  private def append(st: GenStore, rows: Long, tag: Long): Unit =
    spark.range(rows).selectExpr("id", s"$tag as tag")
      .coalesce(1).write.mode("append").parquet(st.dataDir)

  private def runCompact(st: GenStore, threshold: Int): Unit =
    st.compact(threshold, "spec") { from =>
      spark.read.parquet(from)
    } { (df, to) => df.coalesce(1).write.mode("overwrite").parquet(to) }

  private def gen(root: String): String = {
    val p = java.nio.file.Path.of(root, "_gen")
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim
    else "0"
  }

  test("tiny regime: equal-size appends past the file threshold double " +
      "the bytes trivially, so the rewrite cadence is unchanged") {
    val root = java.nio.file.Files
      .createTempDirectory("genstore-tiny").toString + "/st"
    val st = mkStore(root)
    (1 to 4).foreach(i => append(st, 10, i))
    runCompact(st, 3) // 4 files > 3, no base marker -> eager rewrite
    assert(gen(root) == "1", "first over-threshold compact must fire")
    val base = java.nio.file.Files.readString(
      java.nio.file.Path.of(root, "_base_bytes")).trim.toLong
    assert(base > 0L, "swap must record the new generation's bytes")
    // 4 more equal-size appends: bytes ~2x the compacted base -> fires
    (5 to 8).foreach(i => append(st, 10, i))
    runCompact(st, 3)
    assert(gen(root) == "2",
      "equal-size appends past the threshold must still compact " +
        "(bytes doubled trivially against the tiny base)")
  }

  test("data-sized regime: a big base is NOT rewritten on every " +
      "file-threshold breach — only once appended bytes double it; the " +
      "64x-threshold file backstop forces a rewrite regardless") {
    val root = java.nio.file.Files
      .createTempDirectory("genstore-big").toString + "/st"
    val st = mkStore(root)
    append(st, 200000, 0) // the data-sized base
    append(st, 1, 1)      // 2 files > threshold 1 -> establishes base
    runCompact(st, 1)
    assert(gen(root) == "1")
    val base = java.nio.file.Files.readString(
      java.nio.file.Path.of(root, "_base_bytes")).trim.toLong
    // byte-light appends past the file threshold: no rewrite
    (2 to 5).foreach(i => append(st, 1, i))
    runCompact(st, 1)
    assert(gen(root) == "1",
      "a data-sized store must not full-rewrite on a byte-light " +
        "file-threshold breach (quadratic at scale)")
    // appends that double the base: rewrite fires
    append(st, 200000, 6)
    append(st, 200000, 7)
    runCompact(st, 1)
    assert(gen(root) == "2", s"bytes doubled past base=$base but no " +
      "rewrite fired")
    // backstop: > 64x threshold byte-light files force a rewrite
    (1 to 65).foreach(i => append(st, 1, 100 + i))
    runCompact(st, 1)
    assert(gen(root) == "3",
      "the 64x-threshold file backstop must bound listing amplification")
    // content invariant under every decision above
    assert(spark.read.parquet(st.dataDir).count() ==
      200000L + 1 + 4 + 200000L * 2 + 65)
  }

  test("a corrupted generation marker fails loud instead of falling " +
      "back to generation 0 (a swept g0 would read as an EMPTY store)") {
    val root = java.nio.file.Files
      .createTempDirectory("genstore-badgen").toString + "/st"
    val st = mkStore(root)
    (1 to 3).foreach(i => append(st, 5, i))
    runCompact(st, 1) // establishes g1 and sweeps g0
    assert(gen(root) == "1")
    // corrupt through the Hadoop fs (keeps the checksum sidecar in
    // sync — tampering below the fs layer fails loud on the read side
    // via ChecksumException, which is also acceptable)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(root, "_gen"), true)
    try out.write("garbage".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] { mkStore(root).dataDir }
    assert(e.getMessage.contains("refusing to fall back to generation 0"),
      e.getMessage)
  }

  test("StoreMarkers.writeAtomic replaces an existing marker in place " +
      "(no truncate-then-write window) and round-trips through readText") {
    val root = java.nio.file.Files
      .createTempDirectory("genstore-mk").toString
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, "_m")
    StoreMarkers.writeAtomic(fs, p, "1|7|abc")
    assert(StoreMarkers.readText(fs, p).contains("1|7|abc"))
    StoreMarkers.writeAtomic(fs, p, "2|9|abc")
    assert(StoreMarkers.readText(fs, p).contains("2|9|abc"))
    // the temp staging file never lingers
    assert(!fs.exists(new Path(root, "._m.tmp")))
    assert(StoreMarkers.readText(fs, new Path(root, "_absent")).isEmpty)
  }
}
