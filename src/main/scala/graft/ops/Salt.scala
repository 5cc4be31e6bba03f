package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key salting for skewed aggregations — the manual fallback when
  * AQE's skew-join split doesn't apply (aggregations, and joins whose
  * skewed side feeds a window).
  *
  * Two-phase aggregate: keys are spread over `factor` salted sub-keys,
  * partially aggregated per (key, salt), then finally aggregated per key.
  * The second shuffle moves only `factor` rows per key, so a key holding
  * 30% of a 100 TB table costs one executor 1/factor of that instead of
  * all of it. This is exactly the partial/final split
  * `HashAggregateExec` already does for algebraic aggregates — salting is
  * only needed when the partial step can't combine (e.g. `collect_list`,
  * exact distinct counts per key, or a skewed window partition).
  *
  * The salt is `pmod(hash(salt-source), factor)` — deterministic given a
  * salt-source column (e.g. a unique id), so re-runs produce identical
  * partial splits.
  */
object Salt {

  /** Skew DIAGNOSIS — the measurement that decides whether to salt at
    * all and with what factor (and what AQE's skew threshold should be):
    * the top-`k` heaviest keys with absolute count and share of the
    * table. A key whose share approaches 1/parallelism is the straggler
    * bound; shares ≫ that mean [[saltedJoin]]/[[withSalt]] territory.
    *
    * Scale: one map-side-combined count per key, the head bounded by
    * TakeOrderedAndProject (each partition forwards ≤ k rows, no global
    * sort), the table total riding ONE aggregated row through a
    * broadcast join — the share division is the only double op, applied
    * once per output row. */
  def heavyKeys(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    require(keyCols.nonEmpty && k > 0, "need key columns and k > 0")
    // the OUTPUT vocabulary (rank, n, share) is this function's contract,
    // but a KEY column with one of those names (or the internal total's)
    // would collide — key columns named n/share/rank make the output
    // ambiguous by construction, so fail loud; the internal total gets a
    // fresh()-guarded name so a key literally called `_total` cannot make
    // col("_total") ambiguous after the crossJoin
    val reserved = Set("rank", "n", "share")
    val clash = keyCols.filter(c => reserved.contains(c.toLowerCase))
    require(clash.isEmpty, s"heavyKeys key columns ${clash.mkString(", ")} " +
      "collide with the output columns (rank, n, share); alias them first")
    val totalCol = Iterator.iterate("_total")(_ + "_")
      .dropWhile(keyCols.contains).next()
    val gcols = keyCols.map(col)
    val counts = df.groupBy(gcols: _*).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as(totalCol))
    counts
      .orderBy(col("n").desc +: gcols.map(_.asc): _*)
      .limit(k)
      .crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") /
        col(totalCol).cast("double"))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("n").desc +: gcols.map(_.asc): _*)))
      .select((col("rank") +: gcols) ++ Seq(col("n"), col("share")): _*)
  }

  /** Add a `_salt` column in [0, factor). */
  def withSalt(df: DataFrame, saltSource: Column, factor: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSource), lit(factor)))

  /** Skew-safe exact distinct count per key: distinct within (key, salt)
    * partitions first, then merge — each shuffle partition sees at most
    * ~1/factor of a hot key's rows. */
  def distinctCountPerKey(df: DataFrame, key: String, valueCol: String,
      factor: Int = 16): DataFrame =
    withSalt(df, col(valueCol), factor)
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_vals"))
      .groupBy(col(key))
      // salt = hash(value) % factor ⇒ per-salt value sets are DISJOINT,
      // so the distinct count is the SUM of per-salt set sizes. Flattening
      // the sets back into one row would re-concentrate the hot key the
      // salting exists to spread (1B distinct values -> one task's array).
      .agg(sum(size(col("_vals"))).cast("long").as("n_distinct"))

  /** Skew-safe collect_list-equivalent count: two-phase sum. For algebraic
    * aggregates (sum/count/min/max) Spark's own partial aggregation makes
    * this unnecessary; provided for symmetry and as the documented
    * pattern. */
  def countPerKey(df: DataFrame, key: String, factor: Int = 16): DataFrame =
    withSalt(df, monotonically_increasing_id(), factor)
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))

  /** Skew-safe equi-join: the big (skewed) side gets a deterministic salt
    * in [0, factor); the small side is replicated once per salt value, so
    * a hot key's rows spread over `factor` shuffle partitions instead of
    * landing on one task. The result set is IDENTICAL to
    * `big.join(small, keys)` — salting only re-partitions the work.
    *
    * Use when the small side is too large to broadcast AND AQE's
    * skew-join split doesn't engage (it only splits sort-merge joins
    * whose skewed partitions aren't pinned by a downstream requirement —
    * e.g. when the join output feeds a window on the same key, AQE must
    * leave the skew in place; salting moves it anyway). Cost: the small
    * side is shuffled `factor`×, so keep `factor` modest and the small
    * side thin. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: Column, factor: Int = 16): DataFrame = {
    require(factor >= 2, s"salt factor must be >= 2, got $factor")
    val bigS = withSalt(big, saltSource, factor)
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }
}
