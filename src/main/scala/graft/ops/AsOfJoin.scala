package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (J6): for each left row, attach the latest right row whose
  * time is ≤ the left row's time, per key — the point-in-time lookup
  * (fact event → dimension version current at event time).
  *
  * Implemented with the union + ordered-window shape rather than a
  * join-then-top-1: tag both sides, union them, and carry the most recent
  * right payload forward with `last(..., ignoreNulls)` over
  * (partition by key, order by time, rows unbounded preceding..current).
  *
  * Scale (100 TB): exactly ONE shuffle (hash on the key) + a per-key sort,
  * and the intermediate size is |left| + |right| — never the |left|×|right
  * versions per key| blow-up of the join formulation. Skewed keys cost one
  * sorted partition (spillable); no salting needed because the window
  * carries O(payload) state, not O(rows).
  *
  * Determinism: total order inside a key is (time asc, right-before-left,
  * right order column asc), so a right row that ties a left row's
  * timestamp IS visible to it (≤ semantics), and ties among right rows
  * resolve to the greatest `rightOrderCol`.
  */
object AsOfJoin {
  /** `tolerance`: when set, a match farther than this (in the time
    * columns' own unit) is dropped and the payload comes back NULL, the
    * pandas `merge_asof(tolerance=...)` / kdb `wj` bound. The matched
    * right row's time rides inside the carried struct, so the whole
    * payload nulls ATOMICALLY — no stitched half-rows.
    *
    * `direction` (the pandas `merge_asof` trio):
    *  - `"backward"` (default): latest right row with time ≤ left time;
    *    right-row ties resolve to the GREATEST `rightOrderCol`.
    *  - `"forward"`: earliest right row with time ≥ left time; ties
    *    resolve to the SMALLEST `rightOrderCol` (the mirror).
    *  - `"nearest"`: whichever of the two is closer in absolute time;
    *    equal distance takes the backward match. Costs a second
    *    in-partition sort (opposite tie order), NOT a second shuffle —
    *    both windows hash on the same key. */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightOrderCol: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(tolerance.forall(_ > 0),
      s"tolerance must be positive when set, got $tolerance")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"as-of payload columns collide with left columns: " +
        s"${collisions.mkString(", ")} — alias the right side first")
    // temp names must not collide with user columns (the ZOrder.fresh
    // discipline) — a user's own _is_left would be silently destroyed
    val taken = left.columns.toSet ++ right.columns.toSet ++ payload
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val isLeft = fresh("_is_left")
    val t = fresh("_asof_t")
    val ps = fresh("_asof_payload")
    val leftCols = left.columns
    val l = payload.foldLeft(
      left.withColumn(t, col(leftTime)).withColumn(isLeft, lit(1))) {
      (df, p) => df.withColumn(p, lit(null))
    }
    val r0 = right.withColumn(t, col(rightTime)).withColumn(isLeft, lit(0))
    val r = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val unioned = l.select((leftCols ++ payload ++ Seq(t, isLeft))
      .map(col).toIndexedSeq: _*)
      .unionByName(r.select((leftCols ++ payload ++ Seq(t, isLeft))
        .map(col).toIndexedSeq: _*))
    // backward: last right at-or-before (ties: right sorts BEFORE the
    // left row, so ≤ matches are visible; right-row ties land on the
    // greatest order col). forward: the mirror — first right at-or-after
    // over (current row, unbounded following), with the left row sorting
    // BEFORE tied right rows so ≥ matches are visible.
    val wB = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col(isLeft).asc, col(rightOrderCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col(isLeft).desc, col(rightOrderCol).asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // carry the payload as ONE struct per right row, not per-column
    // last(ignoreNulls): independent per-column carries would resurrect a
    // stale non-null value where the current right version has a NULL
    // field — stitching together a row that never existed. The struct is
    // null exactly for left rows, so last(ignoreNulls) lands on the
    // latest right ROW atomically and intra-row NULLs survive.
    // the matched right row's own time rides in the struct so the
    // tolerance gate (and any audit) sees it atomically with the payload
    val tFld = Iterator.iterate("_t")(_ + "_")
      .dropWhile(payload.contains).next()
    val rowStruct = when(col(isLeft) === 0,
      struct(payload.map(col) :+ col(t).as(tFld): _*))
    def gate(c: Column, dist: Column => Column): Column =
      tolerance match {
        case Some(tol) => when(c(tFld).isNotNull && dist(c(tFld)) <= tol, c)
        case None => c
      }
    val psF = fresh("_asof_payload_f")
    val withDirs = direction match {
      case "backward" => unioned.withColumn(ps,
        gate(last(rowStruct, ignoreNulls = true).over(wB),
          mt => col(t) - mt))
      case "forward" => unioned.withColumn(ps,
        gate(first(rowStruct, ignoreNulls = true).over(wF),
          mt => mt - col(t)))
      case "nearest" =>
        val b = gate(last(rowStruct, ignoreNulls = true).over(wB),
          mt => col(t) - mt)
        val f = gate(first(rowStruct, ignoreNulls = true).over(wF),
          mt => mt - col(t))
        unioned.withColumn(ps, b).withColumn(psF, f)
          .withColumn(ps,
            when(col(ps).isNull, col(psF))
              .when(col(psF).isNull, col(ps))
              // equal distance takes the backward match
              .when(col(t) - col(s"$ps.$tFld") <=
                col(s"$psF.$tFld") - col(t), col(ps))
              .otherwise(col(psF)))
    }
    withDirs.filter(col(isLeft) === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"$ps.$p").as(s"asof_$p"))).toIndexedSeq: _*)
  }
}
