package graft.analytics

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Serializable holder for a heap frequent-items [[ItemsSketch]] buffer —
  * the [[KllBuffer]] pattern: Spark's object-hash aggregation keeps the
  * live sketch per group; serialization (spill/shuffle) ships the compact
  * byte image. */
final class FreqBuffer(@transient var sketch: ItemsSketch[String])
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val bytes = sketch.toByteArray(new ArrayOfStringsSerDe)
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val bytes = new Array[Byte](in.readInt())
    in.readFully(bytes)
    sketch = ItemsSketch.getInstance(
      Memory.wrap(bytes), new ArrayOfStringsSerDe)
  }
}

/** Build a frequent-items (Misra–Gries / SpaceSaving family) sketch over
  * string items. `maxMapSize` (a power of 2) bounds memory and sets the
  * error: estimates are within N · 3.5/maxMapSize of truth (one-sided —
  * never underestimating by more than the error bound). The sketch
  * purges once active items exceed 0.75 · maxMapSize (the map's load
  * factor), so when distinct items stay ≤ 0.75 · maxMapSize nothing is
  * ever evicted and every estimate is EXACT — the oracle-promotion
  * configuration. Size with that 0.75 margin, not to the raw distinct
  * count. Merges via
  * the sketch's own `merge`, so partial aggregation is map-side combined
  * and sketch TABLES roll up without rescanning raw data. */
class FreqAggregator(maxMapSize: Int)
    extends Aggregator[String, FreqBuffer, Array[Byte]] {
  override def zero: FreqBuffer =
    new FreqBuffer(new ItemsSketch[String](maxMapSize))
  override def reduce(b: FreqBuffer, v: String): FreqBuffer = {
    if (v != null) b.sketch.update(v)
    b
  }
  override def merge(a: FreqBuffer, b: FreqBuffer): FreqBuffer = {
    a.sketch.merge(b.sketch); a
  }
  override def finish(b: FreqBuffer): Array[Byte] =
    b.sketch.toByteArray(new ArrayOfStringsSerDe)
  override def bufferEncoder: Encoder[FreqBuffer] =
    Encoders.javaSerialization[FreqBuffer]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union serialized frequent-items sketches — the rollup side. */
class FreqUnionAggregator(maxMapSize: Int)
    extends Aggregator[Array[Byte], FreqBuffer, Array[Byte]] {
  override def zero: FreqBuffer =
    new FreqBuffer(new ItemsSketch[String](maxMapSize))
  override def reduce(b: FreqBuffer, v: Array[Byte]): FreqBuffer = {
    if (v != null) // same skip-null contract as the element aggregator
      b.sketch.merge(
        ItemsSketch.getInstance(Memory.wrap(v), new ArrayOfStringsSerDe))
    b
  }
  override def merge(a: FreqBuffer, b: FreqBuffer): FreqBuffer = {
    a.sketch.merge(b.sketch); a
  }
  override def finish(b: FreqBuffer): Array[Byte] =
    b.sketch.toByteArray(new ArrayOfStringsSerDe)
  override def bufferEncoder: Encoder[FreqBuffer] =
    Encoders.javaSerialization[FreqBuffer]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Approximate HEAVY HITTERS — "top item values per stratum" when exact
  * per-item counts would be a giant shuffle and only the head matters
  * (top domains per language, top users per event type, hot keys before
  * salting). Completes the mergeable-sketch family next to HLL
  * (distincts), KLL (quantiles), and CMS (point frequencies): CMS
  * answers "how often is THIS item", the frequent-items sketch answers
  * "WHICH items are frequent" without a candidate set.
  *
  * Same persisted-table design as the other sketches: per-stratum rows a
  * few KB each, parquet-persistable, re-aggregable to coarser strata
  * via [[FreqUnionAggregator]] with raw data never rescanned. */
object FrequentItems {

  /** One frequent-items sketch row per stratum: (strata…, `freq_sketch`,
    * `n_rows`). NULL items are excluded (SQL aggregate semantics). */
  def sketchTable(df: DataFrame, itemCol: String, strata: Seq[String],
      maxMapSize: Int = 1024): DataFrame =
    df.filter(col(itemCol).isNotNull)
      .groupBy(strata.map(col): _*)
      .agg(udaf(new FreqAggregator(maxMapSize))
          .apply(col(itemCol).cast("string")).as("freq_sketch"),
        count(col(itemCol)).as("n_rows"))

  /** Decode a sketch table to the deterministic top-`k` per stratum:
    * (strata…, `rank`, `item`, `est`, `lb`, `ub`). Ordering is
    * (estimate DESC, item ASC) — the sketch's own result order breaks
    * estimate ties arbitrarily, so ranking happens HERE, declaratively,
    * for engine-replayable output. `errorType` NO_FALSE_NEGATIVES
    * returns a superset of the true heavy hitters (safe for
    * "don't miss a hot key"); NO_FALSE_POSITIVES a subset. In the exact
    * configuration (distinct items ≤ 0.75 · maxMapSize) both return
    * every item with its true count. Decode cost is sketch-table-sized — KBs per
    * stratum — through one flatMap + one WindowGroupLimit rank. */
  def topK(sketchTable: DataFrame, strataCol: String, k: Int,
      errorType: ErrorType = ErrorType.NO_FALSE_NEGATIVES): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = sketchTable.sparkSession
    import spark.implicits._
    val rows = sketchTable
      .select(col(strataCol).cast("string").as("_s"), col("freq_sketch"))
      .as[(String, Array[Byte])]
      .flatMap { case (s, bytes) =>
        val sk = ItemsSketch.getInstance(
          Memory.wrap(bytes), new ArrayOfStringsSerDe)
        sk.getFrequentItems(0L, errorType).map(r =>
          (s, r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      }
      .toDF("_s", "item", "est", "lb", "ub")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_s")).orderBy(col("est").desc, col("item"))
    rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_s").as(strataCol), col("rank"), col("item"),
        col("est"), col("lb"), col("ub"))
  }
}
