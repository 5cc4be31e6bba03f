package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) multi-dimensional clustering layout — the faithful
  * analog of the reference's multi-column liquid clustering
  * (`cluster_by=clustering_cols`, `02_silver_processing.py:148`).
  *
  * Plain `repartitionByRange(c1, c2)` sorts lexicographically: parquet
  * row-group min/max stats become selective for `c1` only, and a filter
  * on `c2` alone overlaps every file. Interleaving the bits of
  * equal-frequency bucket ids gives every clustering column ~equal
  * skipping power — the same trick Delta OSS's OPTIMIZE ZORDER BY and
  * every multi-dimensional-clustering paper use.
  *
  * Mechanics (all scale-safe):
  *  1. ONE `approxQuantile` pass (Greenwald-Khanna sketch, driver gets
  *     2^bits boundaries per column — sampling cost, no shuffle);
  *  2. per row, each column maps to its equal-frequency bucket by
  *     counting boundaries <= value (a codegen'd fold over a literal
  *     array — 2^bits adds, no join);
  *  3. bucket bits interleave into one long z-value (bit ops, codegen'd);
  *  4. `repartitionByRange(_zval)` + `sortWithinPartitions(_zval)` — one
  *     range exchange, exactly the shuffle budget of the lexicographic
  *     layout it replaces.
  *
  * Nulls land in bucket 0 (sort first, like NULLS FIRST). Supported
  * types: numeric, date, timestamp (cast to double rank-space); other
  * types fall back to the lexicographic layout in [[ClusterLayout]].
  */
object ZOrder {

  private[ops] def zorderable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Rank-space projection of a zorderable column to double. A direct
    * cast works for numerics and TIMESTAMP, but DATE→DOUBLE and
    * TIMESTAMP_NTZ→DOUBLE are illegal under Spark 4's default ANSI mode —
    * go through days-since-epoch / a TIMESTAMP cast instead. */
  private def toRankSpace(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c).cast("double")
    case TimestampNTZType => c.cast(TimestampType).cast("double")
    case _ => c.cast("double")
  }

  /** The interleaved z-value column for `bucketCols` (each already an
    * int in [0, 2^bits)). Bit b of bucket i lands at position
    * b * ncols + i, so columns alternate significance. */
  private def interleave(bucketCols: Seq[Column], bits: Int): Column = {
    val n = bucketCols.size
    // bit b of column i lands at position b*n+i; Java shifts wrap mod 64,
    // so exceeding the non-sign bits would silently alias high bucket
    // bits onto low positions and corrupt the ordering — fail loud
    require(bits * n <= 63,
      s"z-order interleave needs bits*cols <= 63, got $bits*$n — " +
        "lower `bits` or cluster on fewer columns")
    val pieces = for {
      b <- 0 until bits
      (bc, i) <- bucketCols.zipWithIndex
    } yield shiftleft(
      shiftright(bc, b).bitwiseAND(lit(1)).cast(LongType),
      b * n + i)
    pieces.reduce(_ + _)
  }

  /** EXACT-rank z-values — [[layout]]'s bucketing made deterministic and
    * engine-portable: instead of the approxQuantile sketch (whose
    * boundaries depend on sampling), each column's bucket comes from its
    * exact equal-frequency rank, bucket = ((rank−1)·2^bits) div N with
    * `tieCol` breaking value ties. Every ingredient (row_number by a
    * total order, integer arithmetic, bit interleave) is ANSI-portable,
    * so the z-value column itself is oracle-checkable bit-for-bit — the
    * declared-surface form of the clustering operator. Rank rides the
    * skew-safe [[Rank.globalRank]] machinery (range exchange + broadcast
    * shard offsets, one per clustering column), NOT an unpartitioned
    * window; the cost is `cols.size` range exchanges, same order as the
    * one-off layout write this feeds.
    *
    * [[layout]] remains the production entry point — the sketch pass is
    * cheaper than per-column exact ranks and file skipping only needs
    * approximate boundaries. This form exists for when determinism
    * matters more: reproducible layouts across reruns/engines, and the
    * correctness gate. */
  def exactZValues(df: DataFrame, cols: Seq[String], tieCol: String,
      bits: Int = 6, outCol: String = "zval"): DataFrame = {
    require(cols.nonEmpty, "exactZValues needs at least one column")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists; pass outCol = <other name>")
    val nBuckets = 1L << bits
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(df.columns.contains).next()
    val rankNames = cols.indices.map(i => fresh(s"_zxr$i"))
    val ranked = cols.zip(rankNames).foldLeft(df) { case (acc, (c, rn)) =>
      Rank.globalRank(acc, Seq(col(c), col(tieCol)), rn)
    }
    val nName = fresh("_zxn")
    val nRow = broadcast(df.agg(count(lit(1)).as(nName)))
    val buckets = rankNames.map(rn =>
      Fixed.ldiv((col(rn) - 1L) * lit(nBuckets), col(nName)))
    ranked.crossJoin(nRow)
      .withColumn(outCol, interleave(buckets, bits))
      .drop(rankNames :+ nName: _*)
  }

  /** Layout `df` for multi-dimensional data skipping on `cols`.
    *
    * `bits` trades bucket resolution against the per-row fold cost
    * (2^bits boundary compares per column); 6 (64 buckets/column) is
    * plenty for file-level skipping at any table size — skipping
    * granularity is files, not rows, and even a 100 TB table has far
    * fewer than 64^2 files per clustering pair.
    *
    * `boundsFrom`: frame the quantile boundaries are sketched from —
    * defaults to `df`, but when `df` sits atop an expensive pipeline
    * (e.g. the silver dedup window), pass a CHEAP equivalent source
    * (the bronze scan): the sketch is an eager extra action, and layout
    * boundaries only need the approximate value distribution, which the
    * pre-dedup data approximates fine. The passed frame just needs the
    * clustering columns. */
  def layout(df: DataFrame, cols: Seq[String], bits: Int = 6,
      relativeError: Double = 0.01,
      numPartitions: Option[Int] = None,
      boundsFrom: Option[DataFrame] = None): DataFrame = {
    require(cols.nonEmpty, "ZOrder.layout needs at least one column")
    val nBuckets = 1 << bits
    // temp names must not collide with user columns (withColumn would
    // silently REPLACE a same-named column and drop() would delete it)
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(df.columns.contains).next()
    val tmp = cols.indices.map(i => fresh(s"_zq$i"))
    val zvalName = fresh("_zval")
    def ranked(src: DataFrame): DataFrame = src.select(
      cols.zip(tmp).map { case (c, t) =>
        toRankSpace(col(c), src.schema(c).dataType).as(t)
      }.toIndexedSeq: _*)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // one driver-side sketch pass (column-pruned scan of boundsFrom)
    val bounds = ranked(boundsFrom.getOrElse(df))
      .stat.approxQuantile(tmp.toArray, probs, relativeError)
    val withTmp = df.select(
      df.columns.map(col).toIndexedSeq ++
        cols.zip(tmp).map { case (c, t) =>
          toRankSpace(col(c), df.schema(c).dataType).as(t)
        }: _*)
    val bucketCols = tmp.zip(bounds.toSeq).map { case (t, bs) =>
      val bArr = array(bs.distinct.map(lit(_)).toIndexedSeq: _*)
      aggregate(bArr, lit(0),
        (acc, b) => acc + when(col(t) >= b, 1).otherwise(0))
    }
    val zd = withTmp.withColumn(zvalName, interleave(bucketCols, bits))
    // numPartitions ~ target file count (the optimize-write analog);
    // default = spark.sql.shuffle.partitions
    numPartitions.fold(zd.repartitionByRange(col(zvalName)))(
        n => zd.repartitionByRange(n, col(zvalName)))
      .sortWithinPartitions(col(zvalName))
      .drop(tmp :+ zvalName: _*)
  }
}
