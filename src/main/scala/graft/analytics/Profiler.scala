package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Int128Sum.int128Sum
import graft.ops.Fixed.ldiv

/** Schema-generic table profiling — the data-quality census (the
  * deequ/Great-Expectations "profile" pass) that precedes writing
  * expectation rules: per column, row/null/distinct counts, typed
  * min/max, and mean string length. One row out per column, so the
  * result is queryable/diffable across snapshots (join two profiles on
  * `col_name` to detect drift).
  *
  * Shape: ONE wide aggregate over the table computes every metric, then
  * a driver-built literal unpivot (explode over structs of the 1-row
  * aggregate) goes long — so the table is scanned once regardless of
  * column count. The only caveat at scale is exact distinct counts:
  * multiple `count(DISTINCT c)` in one aggregate expand the input
  * ×(distinct-column count) before the shuffle (Spark's Expand), which
  * at 100 TB × 16 columns is a 1.6 PB shuffle. `exactDistinct = false`
  * (the default) therefore uses `approx_count_distinct` (HLL, one pass,
  * no expand, ~±5% rsd); the exact form exists for gate-checkable runs and
  * modest tables.
  *
  * Metric typing is portability-driven (bit-exact oracle): counts are
  * longs; numeric min/max surface as DECIMAL(38,6) in `min_num`/
  * `max_num` (NULL for non-numerics); date/timestamp/string/boolean
  * min/max surface as ISO strings in `min_str`/`max_str`; mean string
  * length is exact integer micro-units (`avg_len_x1e6` = (Σlen·10⁶) div
  * n) rather than a float division. Nulls are excluded from min/max/
  * distinct (SQL semantics); a column with no non-null values yields
  * NULL metrics. */
object Profiler {

  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    require(df.schema.fields.nonEmpty, "cannot profile a zero-column frame")
    val fields = df.schema.fields.toSeq

    def metricsFor(f: StructField): Seq[(String, Column)] = {
      val c = col(s"`${f.name}`")
      val strForm: Option[Column] = f.dataType match {
        case StringType => Some(c)
        case DateType | TimestampType | TimestampNTZType | BooleanType =>
          Some(c.cast("string"))
        case _ => None
      }
      val numForm: Option[Column] = f.dataType match {
        case _: NumericType => Some(c.cast("decimal(38,6)"))
        case _ => None
      }
      // Map types are not orderable/hashable for distinct aggregation —
      // even NESTED inside arrays/structs — so a schema-generic profiler
      // must skip them (null n_distinct), not crash the publish
      def hasMap(dt: DataType): Boolean = dt match {
        case _: MapType => true
        case ArrayType(et, _) => hasMap(et)
        case StructType(fs) => fs.exists(x => hasMap(x.dataType))
        case _ => false
      }
      val distinct =
        if (hasMap(f.dataType)) lit(null).cast("long")
        else if (exactDistinct) count_distinct(c)
        else approx_count_distinct(c)
      Seq(
        "n_nulls" -> sum(when(c.isNull, 1L).otherwise(0L)),
        "n_distinct" -> distinct,
        "min_num" -> numForm.map(min).getOrElse(lit(null).cast("decimal(38,6)")),
        "max_num" -> numForm.map(max).getOrElse(lit(null).cast("decimal(38,6)")),
        "min_str" -> strForm.map(min).getOrElse(lit(null).cast("string")),
        "max_str" -> strForm.map(max).getOrElse(lit(null).cast("string")),
        "avg_len_x1e6" -> (f.dataType match {
          case StringType =>
            val nonNull = count(c)
            when(nonNull > 0L,
              ldiv(sum(length(c).cast("decimal(38,0)")) * lit(1000000L),
                nonNull.cast("decimal(38,0)")))
          case _ => lit(null).cast("long")
        }))
    }

    val aggExprs = fields.flatMap(f => metricsFor(f).map { case (m, e) =>
      e.as(s"_p_${f.name}_$m")
    })
    val wide = df.agg(count(lit(1)).as("_p_n_rows"), aggExprs: _*)

    val structs = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col("_p_n_rows").as("n_rows"),
        col(s"`_p_${f.name}_n_nulls`").cast("long").as("n_nulls"),
        col(s"`_p_${f.name}_n_distinct`").cast("long").as("n_distinct"),
        col(s"`_p_${f.name}_min_num`").as("min_num"),
        col(s"`_p_${f.name}_max_num`").as("max_num"),
        col(s"`_p_${f.name}_min_str`").as("min_str"),
        col(s"`_p_${f.name}_max_str`").as("max_str"),
        col(s"`_p_${f.name}_avg_len_x1e6`").cast("long").as("avg_len_x1e6"))
    }
    wide.select(explode(array(structs: _*)).as("_m")).select(col("_m.*"))
  }

  /** Row-level diff between two snapshots of a PK-keyed table — the
    * "what changed between dataset v1 and v2" pass behind incremental
    * publication audits and CDC backfills. One row per differing key:
    * `status` ∈ ('added', 'removed', 'changed'); unchanged keys emit
    * nothing (at 100 TB the diff is the small output, the table is not).
    *
    * `compareCols` are the value columns that define row identity
    * (explicit, not "everything else": audit/lineage columns would
    * otherwise mark every row changed). Comparison is an md5 over the
    * canonical string form — each value rendered as `V<cast>` and NULL
    * as `N` (a flag PREFIX, not a sentinel substitution, so no string
    * VALUE can collide with NULL), \u0001-joined — computed BEFORE the
    * join so the full-outer merge carries one 32-char column per side
    * instead of every compared column. Two scans + one full-outer shuffle on the PK; nothing
    * driver-side.
    *
    * A duplicate PK within one snapshot is a contract violation the diff
    * would silently mangle (full-outer fan-out) — caller owns PK
    * uniqueness (run the dedup operator first; `q_table_profile`'s
    * n_distinct == n_rows is the check). */
  def snapshotDiff(a: DataFrame, b: DataFrame, pkCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(pkCols.nonEmpty, "snapshotDiff needs at least one PK column")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    // length-prefixed framing: "V<len>:<value>" / "N" tokens joined by
    // \u0001 are uniquely decodable even when values CONTAIN the
    // separator (a bare prefix scheme is injectable: ("x\u0001Vy", "z")
    // vs ("x", "y\u0001Vz") would collide) — spec-pinned
    def sig(df: DataFrame, as: String) = df.select(
      pkCols.map(col) :+
        md5(concat_ws("\u0001", compareCols.map { c =>
          val v = col(c).cast("string")
          when(col(c).isNull, lit("N"))
            .otherwise(concat(lit("V"), length(v).cast("string"),
              lit(":"), v))
        }: _*)).as(as): _*)
    val sa = sig(a, "_sig_a")
    val sb = sig(b, "_sig_b")
    sa.join(sb, pkCols, "full_outer")
      .withColumn("status",
        when(col("_sig_b").isNull, lit("removed"))
          .when(col("_sig_a").isNull, lit("added"))
          .when(col("_sig_a") =!= col("_sig_b"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(pkCols.map(col) :+ col("status"): _*)
  }

  /** Referential-integrity / inclusion-dependency check — the FK half of
    * the census (deequ's `isContainedIn`, the Spider-style IND test):
    * does every non-null `childCol` value appear in `parentCol`? One
    * row out per checked relation:
    * `n_rows`/`n_distinct` (non-null child occurrences/values),
    * `n_null_rows` (SQL FK semantics ignore nulls — reported, not
    * counted as orphans), `orphan_rows`/`orphan_distinct` (child
    * occurrences/values absent from the parent; 0 ⇔ the FK holds).
    *
    * Shape: the child aggregates to (key, count) first — one hash
    * aggregate — so the anti-join against the parent's distinct keys
    * runs at distinct-value size, not table size, and `orphan_rows`
    * falls out as a sum over the surviving groups. Both sides shuffle
    * once on the key; nothing is collected. */
  def inclusion(child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String,
      relation: String): DataFrame = {
    val keyed = child.select(col(childCol).as("_k"))
    val nullRow = keyed.agg(
      coalesce(sum(when(col("_k").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_rows"))
    val groups = keyed.filter(col("_k").isNotNull)
      .groupBy(col("_k")).agg(count(lit(1)).as("_n"))
    val parentKeys = parent.select(col(parentCol).as("_pk"))
      .filter(col("_pk").isNotNull).distinct()
    val orphans = groups.join(parentKeys,
      groups("_k") === parentKeys("_pk"), "left_anti")
    val totals = groups.agg(
      coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_distinct"))
    val orphanTotals = orphans.agg(
      coalesce(sum(col("_n")), lit(0L)).as("orphan_rows"),
      count(lit(1)).as("orphan_distinct"))
    totals.crossJoin(orphanTotals).crossJoin(nullRow)
      .select(lit(relation).as("relation"), col("n_rows"),
        col("n_distinct"), col("n_null_rows"),
        col("orphan_rows"), col("orphan_distinct"))
  }

  /** Pairwise Pearson CORRELATION MATRIX over numeric columns — the
    * EDA pass next to [[profile]]: which measures move together
    * (feature redundancy, sanity checks before modeling). Long-form
    * output (`col_a`, `col_b`, `n`, `corr`), one row per unordered
    * pair, pairwise-complete (each pair drops only rows where EITHER
    * of ITS columns is null — the standard EDA convention, so a sparse
    * column doesn't erase the others' sample).
    *
    * Exactness convention: per-row values and double products are
    * quantized to exact 1e-6 fixed point via `floor(v·1e6)` (floor of
    * an IEEE double is bit-portable across engines — unlike any
    * round-half mode, which was measured to diverge from DuckDB on
    * large-magnitude ties), then summed EXACTLY and order-independently
    * by [[graft.functions.Int128Sum]]; doubles re-enter only in the
    * final correlation formula rounded at 6. The earlier
    * decimal(38,6)-sum form of the same idea paid Spark's ~10×
    * decimal-aggregation tax (4 s per execution at 600k rows — see
    * Int128Sum's doc); the int128 path is exact at a plain-long-sum
    * price. Bound: |value·1e6| and |product·1e6| must fit a long
    * (|v| ≤ 3e6 for products). Beyond it, floor(double)→long SATURATES
    * silently at ±2^63 (Spark's floor is (long)Math.floor — no ANSI
    * error), so out-of-bound inputs diverge from the oracle silently;
    * the caller owns the range check.
    * Zero-variance pairs yield NULL corr.
    *
    * Shape: ONE wide aggregate computes every pair's six power sums in
    * a single scan (k·(k−1)/2 · 6 aggregate expressions — plan-size
    * cost only), then a literal unpivot. Keep `cols` to the handful of
    * measures under study; 20 columns = 190 pairs ≈ 1 140 agg
    * expressions, about the practical plan-size ceiling. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs >= 2 columns")
    require(cols.distinct.size == cols.size, s"duplicate column in $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def tag(a: String, b: String, m: String) = s"_cm_${a}_${b}_$m"
    // codegen'd projection to exact micro-units (products in DOUBLE
    // first — an int/long native multiply would overflow on large
    // values), then imperative int128 sums over the long column
    val proj = pairs.flatMap { case (a, b) =>
      val (x, y) = (col(s"`$a`").cast("double"), col(s"`$b`").cast("double"))
      val both = x.isNotNull && y.isNotNull
      def m(e: Column, mn: String) =
        when(both, floor(e * lit(1e6))).as(tag(a, b, mn))
      Seq(when(both, lit(1L)).as(tag(a, b, "one")),
        m(x, "sx"), m(y, "sy"),
        m(x * x, "sxx"), m(y * y, "syy"), m(x * y, "sxy"))
    }
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(count(col(tag(a, b, "one"))).as(tag(a, b, "n")),
        graft.functions.Int128Sum.int128Sum(col(tag(a, b, "sx")))
          .as(tag(a, b, "sx")),
        graft.functions.Int128Sum.int128Sum(col(tag(a, b, "sy")))
          .as(tag(a, b, "sy")),
        graft.functions.Int128Sum.int128Sum(col(tag(a, b, "sxx")))
          .as(tag(a, b, "sxx")),
        graft.functions.Int128Sum.int128Sum(col(tag(a, b, "syy")))
          .as(tag(a, b, "syy")),
        graft.functions.Int128Sum.int128Sum(col(tag(a, b, "sxy")))
          .as(tag(a, b, "sxy")))
    }
    val wide = df.select(proj: _*).agg(aggs.head, aggs.tail: _*)
    // unpivot the RAW power sums first and compute the correlation
    // formula ONCE over the exploded rows: inlining the formula into
    // every pair's struct (the obvious one-step unpivot) generates a
    // projection with k·(k−1)/2 copies of the math tree, whose Janino
    // compile alone cost ~7 s per execution at 6 pairs — and the
    // compile re-runs whenever the plan cache misses
    val structs = pairs.map { case (a, b) =>
      def g(m: String) = col(s"`${tag(a, b, m)}`")
      // micro-unit decimal sums → doubles → /1e6: both engines make
      // the identical nearest-double conversion of the exact integer
      def d(m: String) = (g(m).cast("double") / lit(1e6)).as(m)
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        g("n").cast("long").as("n"),
        d("sx"), d("sy"), d("sxx"), d("syy"), d("sxy"))
    }
    val n = col("n").cast("double")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    wide.select(explode(array(structs: _*)).as("_m")).select(col("_m.*"))
      .select(col("col_a"), col("col_b"), col("n"),
        when(varx > 0.0 && vary > 0.0,
          round((n * col("sxy") - col("sx") * col("sy"))
            / (sqrt(varx) * sqrt(vary)), 6)).as("corr"))
  }

  /** SPEARMAN rank correlation between two numeric columns — the
    * monotone-association companion to [[correlationMatrix]]'s Pearson
    * (outlier-robust, captures any monotone relation, the standard
    * screen when linearity is doubtful). Computed as Pearson over
    * AVERAGE ranks with exact tie handling: values quantize to 1e-6
    * fixed point, per-value doubled average ranks come from the tie
    * identity 2·avgrank = 2·cum − t + 1 on each distinct-value table
    * (the [[graft.analytics.Experiment.mannWhitneyU]] discipline), and
    * the five power sums over the integer doubled ranks accumulate
    * exactly ([[graft.functions.Int128Sum]]) — doubles appear only in
    * the final closed form, rounded at 6. ONE output row: (`n`, `rho`);
    * a constant column (zero rank variance) yields NULL rho. Rows with
    * NULL/NaN/±Inf in either column drop pairwise.
    *
    * Shape: two distinct-value aggregates + two-pass range-partitioned
    * prefix sums ([[graft.ops.PrefixSum]] — continuous columns make the
    * value tables row-count-sized; never a one-task window), two hash
    * joins back to the pair frame, one aggregate. The doubled-rank
    * products are ANSI-checked longs — past ~1.5e9 rows they fail loud
    * rather than silently losing exactness. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(s"`$xCol`").cast("double")
    val y = col(s"`$yCol`").cast("double")
    def fin(c: Column) = c.isNotNull && !isnan(c) &&
      abs(c) =!= lit(Double.PositiveInfinity)
    val base = df.filter(fin(x) && fin(y))
      .select(floor(x * lit(1e6)).as("_xm"),
        floor(y * lit(1e6)).as("_ym"))
      .localCheckpoint(false) // feeds both value tables AND the joins
    def ranks2(vc: String): DataFrame = {
      val vals = base.groupBy(col(vc)).agg(count(lit(1)).as("_t"))
      graft.ops.PrefixSum.runningSums(vals, Seq(col(vc).asc),
          Seq("_t" -> "_ft"))
        .select(col(vc),
          (lit(2L) * col("_ft") - col("_t") + lit(1L)).as(s"_r2$vc"))
    }
    val pairs = base
      .join(ranks2("_xm"), Seq("_xm"))
      .join(ranks2("_ym"), Seq("_ym"))
      .select(col("_r2_xm").as("_a"), col("_r2_ym").as("_b"))
    import graft.functions.Int128Sum.int128Sum
    val agg = pairs.agg(
      count(lit(1)).as("n"),
      int128Sum(col("_a")).as("_sa"),
      int128Sum(col("_b")).as("_sb"),
      int128Sum(col("_a") * col("_a")).as("_saa"),
      int128Sum(col("_b") * col("_b")).as("_sbb"),
      int128Sum(col("_a") * col("_b")).as("_sab"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    val varx = n * d(col("_saa")) - d(col("_sa")) * d(col("_sa"))
    val vary = n * d(col("_sbb")) - d(col("_sb")) * d(col("_sb"))
    agg.select(col("n"),
      when(varx > 0.0 && vary > 0.0,
        round((n * d(col("_sab")) - d(col("_sa")) * d(col("_sb")))
          / (sqrt(varx) * sqrt(vary)), 6)).as("rho"))
  }

  /** K-ANONYMITY census over a quasi-identifier set — the privacy
    * check before publishing or training on person-adjacent data: every
    * row should be indistinguishable from at least k−1 others on the
    * quasi-identifiers (the linkage-attack bound). Returns ONE summary
    * row: `k_anonymity` (the smallest equivalence-class size — the
    * dataset's k), `n_classes`, `n_rows`, and `rows_below_k` /
    * `classes_below_k` for the caller's threshold (the re-identifiable
    * exposure a suppression pass must handle). NULL quasi-identifier
    * values group as values (SQL GROUP BY semantics — null is a
    * linkable value).
    *
    * Shape: one hash aggregate to class sizes, one tiny re-aggregation
    * — the k of a 100 TB table costs one count per class, never a
    * window. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      threshold: Long = 5L): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(threshold >= 1L, s"threshold must be >= 1, got $threshold")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_sz"))
      .agg(min(col("_sz")).as("k_anonymity"),
        count(lit(1)).as("n_classes"),
        sum(col("_sz")).as("n_rows"),
        coalesce(sum(when(col("_sz") < threshold, col("_sz"))), lit(0L))
          .as("rows_below_k"),
        coalesce(sum(when(col("_sz") < threshold, 1L)), lit(0L))
          .as("classes_below_k"))
  }

  /** L-DIVERSITY census — k-anonymity's companion: a k-anonymous
    * equivalence class is still exposed when everyone in it shares the
    * SAME sensitive value (the homogeneity attack), so each class must
    * carry at least l DISTINCT sensitive values. Returns ONE summary
    * row: `l_diversity` (the smallest per-class distinct-sensitive
    * count — the dataset's l), `n_classes`, `n_rows`, and
    * `rows_below_l` / `classes_below_l` for the caller's threshold.
    * NULL quasi-identifiers group as values; a NULL sensitive value
    * counts as a distinct value (it still partitions the class — SQL
    * count-distinct semantics would silently uncount it, so the
    * distinct count runs over (class, sensitive) groups instead).
    *
    * Shape: two stacked hash aggregates (class+sensitive → class → one
    * row) — distinct-value-sized, never a window or Expand. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, threshold: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs quasi-identifier columns")
    require(threshold >= 1L, s"threshold must be >= 1, got $threshold")
    val perValue = df
      .groupBy((quasiCols :+ sensitiveCol).map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("_n"))
    val perClass = perValue.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("_l"), sum(col("_n")).as("_sz"))
    perClass.agg(min(col("_l")).as("l_diversity"),
      count(lit(1)).as("n_classes"),
      sum(col("_sz")).as("n_rows"),
      coalesce(sum(when(col("_l") < threshold, col("_sz"))), lit(0L))
        .as("rows_below_l"),
      coalesce(sum(when(col("_l") < threshold, 1L)), lit(0L))
        .as("classes_below_l"))
  }

  /** T-CLOSENESS census — the third member of the k-anonymity family:
    * an l-diverse class is still exposed when its sensitive-value
    * DISTRIBUTION diverges from the table's (the skewness attack —
    * "everyone in this zip code has ulcers"), so each class's
    * distribution must stay within t of the global one. Distance is
    * the categorical t-closeness metric, total variation
    *   d(C) = ½ Σ_v |P_C(v) − Q(v)|,
    * computed EXACTLY on the common denominator: with per-class-value
    * counts n_Cv, class sizes n_C, global value counts n_v and table
    * size N,
    *   d(C)·10⁶ = ⌊(Σ_{v∈C} (|n_Cv·N − n_v·n_C| − n_v·n_C) + n_C·N)
    *              ·10⁶ / (2·n_C·N)⌋
    * — the absent-value terms (n_Cv = 0 contribute n_v·n_C) collapse
    * into the closed-form n_C·N tail, so only present (class, value)
    * pairs are ever enumerated. ONE row: (`t_closeness` = the worst
    * class's d·10⁶, `n_classes`, `n_rows`, `rows_above_t`,
    * `classes_above_t` for the caller's `thresholdX1e6`). NULL
    * sensitive values count as a value (the [[lDiversity]] rule).
    *
    * Shape: one (class, value) hash aggregate, a class-partitioned
    * window over it (partition size ≤ the sensitive domain — bounded),
    * a broadcast global-value join, then two stacked aggregates —
    * everything after the first aggregate is distinct-(class,
    * value)-sized; products ride decimal(38,0) (n_Cv·N passes long
    * range at ~3e9 rows). */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, thresholdX1e6: Long = 200000L): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs quasi-identifier columns")
    require(thresholdX1e6 >= 0,
      s"thresholdX1e6 must be >= 0, got $thresholdX1e6")
    val qc = quasiCols.map(c => col(s"`$c`"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val perValue = df
      .groupBy((quasiCols :+ sensitiveCol).map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("_ncv"))
    val valueTotals = perValue.groupBy(col(s"`$sensitiveCol`")
        .as("_svt"))
      .agg(sum(col("_ncv")).as("_nv"))
    val totalRow = broadcast(valueTotals.agg(sum(col("_nv")).as("_nn")))
    // class size via a window over the same quasi partition (a JOIN on
    // the quasi key would need per-column null-safe equality; windows
    // group NULL keys natively — the lDiversity rule)
    val wClass = Window.partitionBy(qc: _*)
    val terms = perValue
      .withColumn("_nc", sum(col("_ncv")).over(wClass))
      .join(broadcast(valueTotals),
        col(s"`$sensitiveCol`") <=> col("_svt")) // null value = a value
      .crossJoin(totalRow)
      .withColumn("_term",
        abs(dec(col("_ncv")) * dec(col("_nn")) -
          dec(col("_nv")) * dec(col("_nc"))) -
          dec(col("_nv")) * dec(col("_nc")))
    val perClass = terms.groupBy(qc: _*)
      .agg(min(col("_nc")).as("_nc"), min(col("_nn")).as("_nn"),
        sum(col("_term")).as("_s"))
      .select(col("_nc"), graft.ops.Fixed.ldiv(
        (col("_s") + dec(col("_nc")) * dec(col("_nn"))) * lit(1000000L),
        lit(2L) * dec(col("_nc")) * dec(col("_nn"))).as("_d"))
    perClass.agg(
      max(col("_d")).as("t_closeness_x1e6"),
      count(lit(1)).as("n_classes"),
      sum(col("_nc")).as("n_rows"),
      coalesce(sum(when(col("_d") > thresholdX1e6, col("_nc"))),
        lit(0L)).as("rows_above_t"),
      coalesce(sum(when(col("_d") > thresholdX1e6, 1L)), lit(0L))
        .as("classes_above_t"))
  }

  /** BENFORD'S-LAW first-digit analysis — the classic anomaly/fraud
    * screen for naturally-occurring positive measures (amounts, sizes,
    * populations): organically generated magnitudes have first digit d
    * with probability log₁₀(1+1/d); fabricated or truncated data
    * doesn't. One row per digit 1-9 with the observed count, the
    * observed and expected rates, and the digit's χ² contribution
    * (Σ over rows = the test statistic; vs χ²₈, ≈15.5 at p=.05).
    *
    * Rows with NULL, zero, or non-finite values are excluded (they have
    * no first significant digit); negatives contribute their magnitude.
    * The first digit comes from the DECIMAL STRING form of the
    * magnitude (regexp for the first 1-9), not float log arithmetic —
    * exact for every representable value. Doubles appear only in the
    * final rate/χ² arithmetic from exact integers and the log₁₀
    * constants, rounded at 6. One digit-keyed aggregate (9 groups) +
    * a broadcast total. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val digit = regexp_extract(
      abs(col(valueCol)).cast("decimal(38,6)").cast("string"),
      "[1-9]", 0)
    // the finiteness guard runs on the double view: NaN passes
    // abs(v) > 0 under Spark's NaN ordering and Infinity trivially
    // does, and either would throw in the ANSI decimal cast above
    val v = col(valueCol).cast("double")
    val counts = df
      .filter(col(valueCol).isNotNull && !isnan(v) &&
        abs(v) > 0 && abs(v) =!= lit(Double.PositiveInfinity))
      .select(digit.as("_d"))
      .filter(col("_d") =!= "")
      .groupBy(col("_d").cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = broadcast(counts.agg(sum(col("n")).as("_n")))
    val spark = df.sparkSession
    import spark.implicits._
    val expected = broadcast((1 to 9).map(d =>
      (d, math.log10(1.0 + 1.0 / d))).toDF("digit", "_exp"))
    expected.join(counts, Seq("digit"), "left").crossJoin(tot)
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("observed", round(
        col("n").cast("double") / col("_n").cast("double"), 6))
      .withColumn("expected", round(col("_exp"), 6))
      .withColumn("chi2_term", round({
        val e = col("_exp") * col("_n").cast("double")
        (col("n").cast("double") - e) * (col("n").cast("double") - e) / e
      }, 6))
      .select(col("digit"), col("n"), col("observed"), col("expected"),
        col("chi2_term"))
  }

  /** CRAMÉR'S V between two categorical columns — the bounded-to-[0,1]
    * association strength next to [[mutualInformation]] (MI is in nats
    * and unbounded; V answers "how strong on an absolute scale"):
    * V = √(χ²/(n·(min(r,c)−1))) over the contingency table. Returns ONE
    * summary row: `n`, `n_rows_x`/`n_cols_y` (distinct category counts),
    * `chi2`, and `cramers_v`, the last two rounded at 6. Rows with a
    * NULL category on either axis drop (complete-case — χ²'s expected-
    * count model needs every cell inside the r×c grid, and a NULL
    * "category" would silently shrink the min(r,c)−1 degrees of
    * freedom). Degenerate tables (a single category on either
    * axis) yield NULL chi2/V.
    *
    * χ² uses the algebraic form Σ o²/e − n so EMPTY cells (absent from
    * the observed-cell table but present in the full r×c grid) need no
    * materialization — an o=0 cell contributes 0 to Σ o²/e, while the
    * naive Σ (o−e)²/e would silently miss its e term. Every input is an
    * exact integer count; each observed cell's o²/e is double arithmetic
    * from those exact integers (correctly-rounded ops, deterministic),
    * quantized to 1e-6 fixed point and summed EXACTLY by
    * [[graft.functions.Int128Sum]] — a raw double sum across cells would
    * be accumulation-order-dependent and flake the oracle.
    *
    * Shape: one (x, y) hash aggregate (≤ r·c cells), two cell-table
    * re-aggregations for the marginals, a broadcast total, one cell-
    * level sum — the 100 TB cost is the single scan to cells. */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // complete-case: count_distinct ignores NULL (it would corrupt the
    // min(r,c)−1 degrees of freedom) and SQL's null-unsafe marginal
    // joins drop NULL cells — so rows with a NULL category drop here,
    // ONE consistent contract instead of a half-counted NULL category
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("n_xy"))
      .localCheckpoint(false) // feeds marginals + the cell sum
    val xm = broadcast(cells.groupBy(col("_x").as("_mx"))
      .agg(sum(col("n_xy")).as("n_x")))
    val ym = broadcast(cells.groupBy(col("_y").as("_my"))
      .agg(sum(col("n_xy")).as("n_y")))
    val tot = broadcast(cells.agg(sum(col("n_xy")).as("_n"),
      count_distinct(col("_x")).as("_r"), count_distinct(col("_y")).as("_c")))
    val e = col("n_x").cast("double") * col("n_y").cast("double") /
      col("_n").cast("double")
    val o = col("n_xy").cast("double")
    val termMicros = floor((o * o / e) * lit(1e6))
    // clamp: χ² ≥ 0 by definition, but the floor quantization can land
    // Σo²/e a few µ below n at exact independence (sqrt(−ε) = NaN)
    val chi2 = greatest(
      col("_chi2m").cast("double") / lit(1e6) - col("_n").cast("double"),
      lit(0.0))
    cells
      .join(xm, col("_x") <=> col("_mx"))
      .join(ym, col("_y") <=> col("_my"))
      .crossJoin(tot)
      .groupBy(col("_n"), col("_r"), col("_c"))
      .agg(int128Sum(termMicros).as("_chi2m"))
      .select(col("_n").as("n"),
        col("_r").as("n_rows_x"), col("_c").as("n_cols_y"),
        when(col("_r") > 1 && col("_c") > 1, round(chi2, 6)).as("chi2"),
        when(col("_r") > 1 && col("_c") > 1, round(
          sqrt(chi2 / (col("_n").cast("double") *
            (least(col("_r"), col("_c")) - lit(1)).cast("double"))), 6))
          .as("cramers_v"))
  }

  /** GINI COEFFICIENT per group — the concentration/inequality summary
    * ("how skewed is spend per segment / tokens per source / traffic per
    * key"): 0 = perfectly equal, →1 = one member holds everything. Uses
    * the rank formula over ascending values,
    * G = 2·Σᵢ i·xᵢ / (n·Σ xᵢ) − (n+1)/n. One row per group with `n`,
    * `total` (exact centi-unit sum as a long) and `gini` rounded at 6.
    * NULL, NaN, ±Infinity and negative values drop (Gini is defined on
    * finite non-negative quantities); an all-zero group yields NULL.
    *
    * Exactness: values quantized to exact 1e-2 fixed point
    * (`floor(v·100)` — centi-units, not micro, so the per-row
    * rank·value product stays within `long` out to ~10¹⁰ rows of
    * ~10⁷-sized values), the two sums accumulated exactly by
    * [[graft.functions.Int128Sum]], doubles only in the final formula.
    * Tie order between equal values cannot change Σ i·xᵢ, so the
    * row_number tie-break is free.
    *
    * Shape: one within-group sort (range exchange per group) + one
    * map-side-combined aggregate — the standard per-group-rank cost. */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(s"`$valueCol`").cast("double")
    // NaN orders above every number in Spark, so `v >= 0` alone lets
    // NaN (floor→0) and +Inf (floor saturates to Long.MaxValue) through
    // and silently corrupts the exact Int128Sum totals — same guard as
    // numericDrift above
    val cents = df.filter(v.isNotNull && !isnan(v) && v >= 0 &&
        v =!= lit(Double.PositiveInfinity))
      .select(col(s"`$groupCol`").as("_g"),
        floor(v * lit(100)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_c").asc)
    val ranked = cents.withColumn("_i", row_number().over(w))
    val agg = ranked.groupBy(col("_g"))
      .agg(count(lit(1)).as("n"),
        int128Sum(col("_c")).as("_s"),
        int128Sum(col("_i") * col("_c")).as("_is"))
    val n = col("n").cast("double")
    val s = col("_s").cast("double")
    agg.select(col("_g").as(groupCol), col("n"),
      col("_s").cast("long").as("total_x100"),
      when(col("_s") > 0, round(
        lit(2.0) * col("_is").cast("double") / (n * s) - (n + 1.0) / n, 6))
        .as("gini"))
  }

  /** MUTUAL INFORMATION between two categorical columns — the
    * feature-selection / redundancy diagnostic ("does `source` tell me
    * anything about `lang`?"): MI = Σ_xy p(x,y)·ln(p(x,y)/(p(x)p(y))),
    * 0 ⇔ independent, min(H(X),H(Y)) at full dependence. One row per
    * observed (x, y) cell with exact counts and the cell's `mi_term`
    * (Σ over rows = the MI, in nats, rounded at 6); NULLs are real
    * categories.
    *
    * Portability is the PSI pattern: probabilities are the exact
    * rationals n/N evaluated as single correctly-rounded double
    * divisions from exact integers (never floored fixed-point — a rare
    * cell must not hit ln(0)), so the only libm surface is one ln.
    *
    * Shape: ONE (x, y) hash aggregate over the data; the margins
    * derive from the cell table (≤ |X|·|Y| rows) by two tiny
    * re-aggregations joined back broadcast. */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("n_xy"))
    val xm = broadcast(cells.groupBy(col("_x").as("_mx"))
      .agg(sum(col("n_xy")).as("n_x")))
    val ym = broadcast(cells.groupBy(col("_y").as("_my"))
      .agg(sum(col("n_xy")).as("n_y")))
    val tot = broadcast(cells.agg(sum(col("n_xy")).as("_n")))
    cells
      .join(xm, col("_x") <=> col("_mx"))
      .join(ym, col("_y") <=> col("_my"))
      .crossJoin(tot)
      .withColumn("_pxy", col("n_xy").cast("double") / col("_n").cast("double"))
      .withColumn("_px", col("n_x").cast("double") / col("_n").cast("double"))
      .withColumn("_py", col("n_y").cast("double") / col("_n").cast("double"))
      .withColumn("mi_term", round(
        col("_pxy") * log(col("_pxy") / (col("_px") * col("_py"))), 6))
      .select(col("_x").as(xCol), col("_y").as(yCol),
        col("n_xy"), col("n_x"), col("n_y"), col("mi_term"))
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic — the binning-free
    * companion to [[numericDrift]]: D = max over values of
    * |F_a(v) − F_b(v)| between the two sides' empirical CDFs. Returns
    * ONE row: `n_a`, `n_b`, `ks_x1e6` (the exact rational
    * max|ca·nb − cb·na| / (na·nb) in floor micro-units — no doubles
    * anywhere, so the statistic is engine-exact), and `significant_05`
    * (D > 1.358·√((na+nb)/(na·nb)), the asymptotic two-sided p<.05
    * line, evaluated in doubles from the exact integers). NULL/NaN
    * values drop; an empty side yields NULL ks.
    *
    * Scale: the distinct-value table of a CONTINUOUS column is ~row
    * count (the value aggregate doesn't compress), so the cumulative
    * counts ride [[graft.ops.PrefixSum]]'s two-pass range-exchange
    * scheme — never a single-task global running-sum window.
    *
    * Exactness: the CDF comparison cross-multiplies the exact
    * cumulative counts into decimal(38,0) per distinct value, so no
    * n²-scaled integer ever needs to fit a long.
    *
    * Shape: one value-keyed count aggregate, one running-sum window
    * over the distinct-value table ordered by value, one max — the
    * data-sized work is the first aggregate. */
  def ksTest(a: DataFrame, b: DataFrame, colName: String): DataFrame = {
    val v = col(s"`$colName`").cast("double")
    def clean(df: DataFrame, side: Int) = df.select(v.as("_v"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
      .withColumn("_side", lit(side))
    val counts = clean(a, 0).unionByName(clean(b, 1))
      .groupBy(col("_v"))
      .agg(sum(when(col("_side") === 0, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_side") === 1, 1L).otherwise(0L)).as("_cb"))
    // CDFs via the two-pass range-partitioned prefix sum, NOT a global
    // running-sum window: for a CONTINUOUS column the distinct-value
    // table is ~row-count-sized, and `sum() OVER (ORDER BY v)` with no
    // partition would funnel all of it through one task
    val cum = graft.ops.PrefixSum.runningSums(counts, Seq(col("_v").asc),
      Seq("_ca" -> "_fa", "_cb" -> "_fb"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val tot = broadcast(counts.agg(
      sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b")))
    val d = cum.crossJoin(tot)
      .select(col("n_a"), col("n_b"),
        abs(dec(col("_fa")) * dec(col("n_b")) -
          dec(col("_fb")) * dec(col("n_a"))).as("_d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("_d")).as("_maxd"))
    d.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        ldiv(col("_maxd") * lit(1000000L).cast("decimal(38,0)"),
          dec(col("n_a")) * dec(col("n_b")))).as("ks_x1e6"))
      .withColumn("significant_05",
        when(col("ks_x1e6").isNotNull,
          col("ks_x1e6").cast("double") / lit(1e6) >
            lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double")
              / (col("n_a").cast("double") * col("n_b").cast("double")))))
  }

  /** NUMERIC drift between two snapshots — [[categoricalDrift]]'s PSI
    * machinery over a CONTINUOUS column: equal-width bins over the
    * pooled [min, max] (one broadcast scalar pass; the last bin is
    * closed so the max lands inside), then per-bin counts, Laplace-
    * smoothed micro-unit rates, and psi_terms exactly as the
    * categorical form (Σ psi_term = the PSI). One row per NON-EMPTY
    * bin with its [bin_lo, bin_hi) bounds rounded at 6; NULL, NaN and
    * ±Infinity values drop; a degenerate pooled range (min == max) collapses to
    * one bin. The bin assignment is a fixed double-op sequence from
    * the pooled extremes, so an external engine reproduces it exactly.
    *
    * Shape: the categorical machinery plus one broadcast min/max —
    * still one data shuffle (the bin-keyed count). */
  def numericDrift(a: DataFrame, b: DataFrame, colName: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = col(s"`$colName`").cast("double")
    // ±Infinity must drop too (not just NaN): one Inf extreme collapses
    // every finite value into bin 0 and floors NaN bin ids downstream
    def clean(df: DataFrame) = df.select(v.as("_v"))
      .filter(col("_v").isNotNull && !isnan(col("_v")) &&
        abs(col("_v")) =!= lit(Double.PositiveInfinity))
    val (aa, bb) = (clean(a), clean(b))
    val mm = broadcast(aa.unionByName(bb)
      .agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi")))
    def binned(df: DataFrame) = df.crossJoin(mm).select(
      when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(least(
          floor((col("_v") - col("_lo")) * lit(bins)
            / (col("_hi") - col("_lo"))), lit(bins - 1L)))
        .cast("int").as("_bin"))
    val width = (col("_hi") - col("_lo")) / lit(bins)
    categoricalDrift(binned(aa), binned(bb), "_bin")
      .crossJoin(mm)
      .select(col("category").as("bin"),
        round(col("_lo") + col("category") * width, 6).as("bin_lo"),
        round(col("_lo") + (col("category") + 1) * width, 6).as("bin_hi"),
        col("n_a"), col("n_b"),
        col("rate_a_x1e6"), col("rate_b_x1e6"), col("psi_term"))
  }

  /** Categorical distribution drift between two snapshots — the PSI
    * (population stability index) report that decides "did the source
    * mix / language mix / label mix move?". One row per category over
    * the UNION of both frames' categories:
    * `n_a`/`n_b` raw counts, `rate_a_x1e6`/`rate_b_x1e6` the
    * Laplace-smoothed rates (n+1)/(N+K) in integer micro-units for
    * display (K = category count — smoothing makes zero bins
    * well-defined, no ε tuning), and `psi_term` = (ra − rb)·ln(ra/rb)
    * rounded to 6 decimals (Σ over rows = the PSI; ≥ 0.2 is the
    * conventional "significant drift" line).
    *
    * The psi_term rates are the exact RATIONALS (n+1)/(N+K) evaluated
    * as one correctly-rounded double division each — NOT the floored
    * micro-unit columns: past ~10⁶ rows per side a rare category's
    * integer rate floors to 0 and ln(0) would poison the PSI with
    * ±Infinity/NaN. Integer→double conversion is exact below 2⁵³ and
    * ÷ and ln are correctly rounded, so the term stays deterministic
    * across engines — the q_stats_agg precedent.
    *
    * Shape: tag-and-union the two frames (no join of two aggregates —
    * one shuffle on the category key), aggregate counts per side,
    * broadcast the three scalars (Na, Nb, K). NULL categories count as
    * a real category (the null rate drifting IS drift). */
  def categoricalDrift(a: DataFrame, b: DataFrame,
      colName: String): DataFrame = {
    val tagged = a.select(col(colName).as("_cat"), lit(0).as("_side"))
      .unionByName(b.select(col(colName).as("_cat"), lit(1).as("_side")))
    val counts = tagged.groupBy(col("_cat")).agg(
      sum(when(col("_side") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_side") === 1, 1L).otherwise(0L)).as("n_b"))
    val scalars = broadcast(counts.agg(
      sum(col("n_a")).as("_na"), sum(col("n_b")).as("_nb"),
      count(lit(1)).as("_k")))
    val rate = (n: Column, tot: Column) =>
      ldiv((n + 1L) * lit(1000000L), tot + col("_k"))
    counts.crossJoin(scalars)
      .withColumn("rate_a_x1e6", rate(col("n_a"), col("_na")))
      .withColumn("rate_b_x1e6", rate(col("n_b"), col("_nb")))
      .withColumn("_ra", (col("n_a") + 1L).cast("double")
        / (col("_na") + col("_k")).cast("double"))
      .withColumn("_rb", (col("n_b") + 1L).cast("double")
        / (col("_nb") + col("_k")).cast("double"))
      .withColumn("psi_term", round(
        (col("_ra") - col("_rb")) * log(col("_ra") / col("_rb")), 6))
      .select(col("_cat").as("category"), col("n_a"), col("n_b"),
        col("rate_a_x1e6"), col("rate_b_x1e6"), col("psi_term"))
  }

  /** LORENZ CURVE table — the banded view behind [[gini]]'s scalar
    * (gini says HOW unequal; the Lorenz deciles say WHERE the mass
    * sits — "the top 10% of documents hold 60% of the tokens", the
    * concentration statement data audits actually quote): rows band
    * value-ASC into `buckets` rank bands (bucket(r) = ⌊r·B/n⌋ over
    * 0-based ranks — the liftTable convention) and each band reports
    * `n`, `sum_x1e6`, cumulative `cum_n`/`cum_sum_x1e6`, and the
    * Lorenz point (`pop_share_x1e6 = ⌊10⁶·cum_n/N⌋`,
    * `value_share_x1e6 = ⌊10⁶·cum_sum/total⌋` — NULL when the total
    * is 0). Values must be NON-NEGATIVE (a Lorenz curve of signed
    * values is undefined — negative rows drop loudly in the count);
    * NULL/NaN/±Inf drop.
    *
    * Ties: rows tied on the micro-quantized value are interchangeable
    * — a tie run split across a band boundary contributes value·count
    * to each side, so the band SUMS are exact with no per-row
    * convention at all (sharper than liftTable, which needed
    * positives-first).
    *
    * Shape: one distinct-value aggregate + ONE [[graft.ops.PrefixSum]]
    * range exchange + a ≤B-row overlap generator + a B-sized
    * cumulative window. */
  def lorenzCurve(df: DataFrame, valueCol: String, buckets: Int = 10)
      : DataFrame = {
    require(buckets >= 2, s"lorenzCurve needs >= 2 buckets, got $buckets")
    val v = col(s"`$valueCol`").cast("double")
    val bLit = lit(buckets.toLong)
    val d = df.filter(v.isNotNull && !isnan(v) && v >= 0.0 &&
        v =!= lit(Double.PositiveInfinity))
      .select(floor(v * lit(1e6)).as("_q"))
      .groupBy(col("_q")).agg(count(lit(1)).as("_t"))
    val run = graft.ops.PrefixSum.runningSums(d, Seq(col("_q").asc),
      Seq("_t" -> "_ft"))
    val tot = broadcast(d.agg(
      coalesce(sum(col("_t")), lit(0L)).as("_n"),
      coalesce(sum(col("_q").cast("decimal(38,0)") * col("_t")),
        lit(0L).cast("decimal(38,0)")).as("_tot")))
    val f = run.crossJoin(tot)
      .withColumn("_s0", col("_ft") - col("_t"))
      .withColumn("_b0", ldiv(col("_s0") * bLit, col("_n")))
      .withColumn("_b1",
        ldiv((col("_s0") + col("_t") - lit(1L)) * bLit, col("_n")))
    val ex = f.select(col("_q"), col("_s0"), col("_t"), col("_n"),
        col("_tot"),
        explode(sequence(col("_b0"), col("_b1"))).as("decile"))
      .withColumn("_lo",
        ldiv(col("decile") * col("_n") + bLit - lit(1L), bLit))
      .withColumn("_hi",
        ldiv((col("decile") + lit(1L)) * col("_n") + bLit - lit(1L),
          bLit) - lit(1L))
      .withColumn("_ov",
        least(col("_s0") + col("_t") - lit(1L), col("_hi")) -
          greatest(col("_s0"), col("_lo")) + lit(1L))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val agg = ex.groupBy(col("decile"))
      .agg(sum(col("_ov")).as("n"),
        sum(dec(col("_q")) * col("_ov")).as("_sm"),
        max(col("_n")).as("_n"), max(col("_tot")).as("_tot"))
    val wc = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("cum_n", sum(col("n")).over(wc))
      .withColumn("_cs", sum(col("_sm")).over(wc))
      .select(col("decile"), col("n"),
        col("_sm").cast("long").as("sum_x1e6"),
        col("cum_n"), col("_cs").cast("long").as("cum_sum_x1e6"),
        ldiv(dec(col("cum_n")) * lit(1000000L), col("_n"))
          .cast("long").as("pop_share_x1e6"),
        when(col("_tot") > 0, ldiv(col("_cs") * lit(1000000L),
          col("_tot")).cast("long")).as("value_share_x1e6"))
  }

  /** HERFINDAHL–HIRSCHMAN concentration of a categorical column —
    * the "how dominated is this corpus by its biggest sources" scalar
    * a mixing plan reads before trusting per-source shares:
    * HHI = Σ_s (n_s/N)², from 1/k (uniform over k) up to 1 (one
    * source), with the reciprocal `eff_sources_x1e6` = the effective
    * number of equally-sized sources. ONE row: (`n_sources`,
    * `n_docs`, `hhi_x1e6 = ⌊10⁶·Σn²/N²⌋`,
    * `eff_sources_x1e6 = ⌊10¹²/hhi_x1e6⌋`) — exact integers end to
    * end; NULL categories drop; an empty input yields NULL ratios.
    *
    * Shape: one category aggregate + a 1-row reduction. */
  def concentration(df: DataFrame, catCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    df.filter(col(s"`$catCol`").isNotNull)
      .groupBy(col(s"`$catCol`")).agg(count(lit(1)).as("_n"))
      .agg(count(lit(1)).as("n_sources"),
        coalesce(sum(col("_n")), lit(0L)).as("n_docs"),
        coalesce(sum(dec(col("_n")) * col("_n")), dec(lit(0L)))
          .as("_sq"))
      .select(col("n_sources"), col("n_docs"),
        when(col("n_docs") > 0L, ldiv(col("_sq") * lit(1000000L),
          dec(col("n_docs")) * col("n_docs")).cast("long"))
          .as("hhi_x1e6"))
      .withColumn("eff_sources_x1e6",
        when(col("hhi_x1e6") > 0L,
          ldiv(lit(1000000000000L), col("hhi_x1e6"))))
  }
}
