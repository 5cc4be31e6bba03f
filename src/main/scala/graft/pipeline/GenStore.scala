package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** GENERATION-directory parquet store — the shared layout under the
  * incrementally-maintained gold-state stores (the mart row store, the
  * curation prefix cache, the LSH band index, the verified-edge store;
  * the aggregate-partial store pioneered the pattern inline in
  * [[Pipeline]] and is spec-pinned there).
  *
  * Layout: data batches live under `<root>/g<N>/part-*.parquet`; a
  * `<root>/_gen` text file names the LIVE generation; root-level
  * metadata files (`_wm` watermark markers, `_lsh_layout` pins) sit
  * beside the generation dirs and are never touched by compaction.
  * Appends target the live generation. COMPACTION writes the rewritten
  * store to generation N+1, repoints the marker, THEN deletes stale
  * generations — a crash at any step leaves the marker naming a
  * complete store (an in-place `mode("overwrite")` would delete the
  * history before the replacement commits, silently truncating it; the
  * ADVICE-class failure the aggregate store already guards against).
  * An orphan `g<N+1>` left by a crashed attempt is overwritten by the
  * next attempt and swept once a later compaction repoints past it.
  *
  * Why compaction is load-bearing at 100 TB: these stores are
  * APPEND-ONLY with keep-latest read semantics, so without compaction
  * they grow with TOTAL HISTORICAL CHANGES — after a year of hourly CDC
  * batches every publish scans, windows, and semi-joins thousands of
  * dead row versions. Rewriting to the keep-latest survivors bounds the
  * store at O(live rows) plus at most `threshold` uncompacted batches,
  * which is what makes the incremental-gold cost model ("O(batch) work
  * + a metadata-sized global pass per publish") hold over an unbounded
  * run history rather than only over a demo's first few batches. The
  * rewrite is a pure filter to the rows keep-latest reads could ever
  * surface, so results are invariant under compaction timing — any
  * threshold is correct, the knob (`gold.compact_after`) only trades
  * rewrite frequency against read amplification.
  *
  * A LEGACY store (written before generations existed) keeps its
  * batches flat under `<root>/`; [[migrateLegacy]] absorbs exactly the
  * `part-*.parquet` data files into `g0` by rename (cheap metadata ops;
  * markers and `_SUCCESS` stay at root, harmless) so the history keeps
  * being read and the first compaction sweep cannot delete it.
  */
private[pipeline] final class GenStore(fs: FileSystem, root: String,
    log: String => Unit, marker: Option[Path] = None) {

  private val genMarkerP = marker.getOrElse(new Path(root, "_gen"))

  private def readGen(): Long =
    if (!fs.exists(genMarkerP)) 0L
    else {
      val in = fs.open(genMarkerP)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.trim.toLongOption.getOrElse(0L)
    }

  /** Live data directory (`<root>/g<N>`) — resolve per use, never
    * cache across a [[compact]] call. Absorbs a legacy flat layout on
    * first touch. */
  def dataDir: String = {
    migrateLegacy()
    s"$root/g${readGen()}"
  }

  /** True when the store has a live data directory (post-migration). */
  def exists: Boolean = fs.exists(new Path(dataDir))

  private def migrateLegacy(): Unit =
    if (!fs.exists(genMarkerP) && fs.exists(new Path(root))) {
      val legacy = fs.listStatus(new Path(root)).filter { st =>
        val n = st.getPath.getName
        st.isFile && n.startsWith("part-") && n.endsWith(".parquet")
      }
      if (legacy.nonEmpty) {
        val g0 = new Path(s"$root/g0")
        fs.mkdirs(g0)
        legacy.foreach(st => fs.rename(st.getPath,
          new Path(g0, st.getPath.getName)))
        log(s"migrated ${legacy.length} legacy flat data files " +
          s"into generation dir $root/g0")
      }
    }

  /** Parquet data files in the live generation — the store's batch
    * count (each append lands at least one file), the compaction
    * trigger. */
  def batchFiles: Int = {
    val d = new Path(dataDir)
    if (!fs.exists(d)) 0
    else fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Compact when the live generation holds more than `threshold` data
    * files: `rewrite` maps the full store read to its keep-latest
    * survivors, the result commits to generation N+1, the marker
    * repoints, and stale generations drop. `write` owns the physical
    * write (partitioning + parquet) so each store keeps its own layout
    * discipline. */
  def compact(threshold: Int, label: String)(
      rewrite: String => DataFrame)(write: (DataFrame, String) => Unit)
      : Unit = {
    val files = batchFiles
    if (files > threshold) {
      val gen = readGen()
      val nextDir = s"$root/g${gen + 1L}"
      // mode semantics live in `write` (callers overwrite): an orphan
      // dir from a crashed prior attempt is replaced wholesale
      write(rewrite(dataDir), nextDir)
      val gm = fs.create(genMarkerP, true)
      try gm.write((gen + 1L).toString.getBytes("UTF-8"))
      finally gm.close()
      // sweep ONLY directories this class could have minted: `g`
      // followed by one-or-more digits ("g" alone, user files like a
      // non-directory `g1`, and anything else at root survive)
      fs.listStatus(new Path(root))
        .filter(st => st.isDirectory &&
          st.getPath.getName != s"g${gen + 1L}" &&
          st.getPath.getName.matches("g\\d+"))
        .foreach(st => fs.delete(st.getPath, true))
      log(s"$label compacted ($files batch files -> generation " +
        s"${gen + 1L})")
    }
  }
}
