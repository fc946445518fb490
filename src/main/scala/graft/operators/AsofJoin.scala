package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event-time) join — the canonical market-data operator
  * the reference's workload family implies but its SQL never reaches
  * (SURVEY §2.3 notes every reference join is equi; the closest shape is
  * the streaming interval join in [[graft.streaming.Streams.intervalJoin]]).
  * For each left row, attach the single right row with the same key whose
  * timestamp is the nearest at-or-before (`backward`) or at-or-after
  * (`forward`) the left timestamp, optionally within a tolerance — the
  * trade↔quote / click↔purchase attribution shape.
  *
  * Spark-first plan: NOT a join at all. Both sides are tagged and
  * union-ed, then ONE hash exchange on the key columns feeds a running
  * `last(ignoreNulls)` window over (ts, side, tiebreak): every left row
  * reads the most recent right row's packed payload from the running
  * window state. Cost is one shuffle of |L|+|R| rows and a linear
  * in-partition sort-scan — versus the naive range-join which explodes to
  * |L|×|R| per key before picking the max. No CartesianProduct, no
  * per-row subquery.
  *
  * Ties on the right timestamp resolve deterministically to the greatest
  * `tieBreak` value (both directions), which is what lets an engine-
  * independent SQL oracle (`ORDER BY ts DESC, tiebreak DESC LIMIT 1`)
  * hash-match this plan row-for-row.
  *
  * 100 TB shape: the exchange partitions by the join keys, so per-key
  * history lands on one task — right for user/instrument-grain keys
  * (bounded per-key history). For a single hot key whose history exceeds
  * a task, the scale path is time-bucketed partitioning — partition by
  * (key, ts_bucket) and carry each bucket's closing right row forward
  * into the next bucket via a second tiny per-bucket pass — the same
  * two-level carry used by [[Packing]]'s prefix sums. Not needed at the
  * reference's key grain; documented so the hazard is named.
  *
  * Contract: `tieBreak` must be non-null on the right side; payload
  * column names must not collide with left column names (pre-alias the
  * right side, e.g. `value AS m_value`). Payload fields MAY be null —
  * the match is carried as a packed non-null struct per right row, so a
  * legitimately-null payload field cannot make the window skip to an
  * older right row.
  */
object AsofJoin {

  /** @param keys      equi key columns (same names both sides)
    * @param leftTs    left event-time column (any orderable type; use
    *                  integer micros for engine-portable gates)
    * @param rightTs   right event-time column
    * @param tieBreak  right column breaking ts ties (greatest wins);
    *                  must be non-null AND unique per (keys, rightTs) —
    *                  an event/sequence id. Duplicate (keys, ts,
    *                  tieBreak) right rows would sort as exact window
    *                  ties and the attached payload would depend on
    *                  shuffle order
    * @param payload   right columns to attach (already aliased to their
    *                  output names; may include copies of rightTs /
    *                  tieBreak under output aliases)
    * @param direction "backward" (nearest at-or-before) or "forward"
    *                  (nearest at-or-after)
    * @param tolerance max |leftTs − rightTs| as a Column in the ts
    *                  column's difference type (e.g. `lit(604800000000L)`
    *                  for 7 days over micros); matches farther away
    *                  become nulls (left row is kept — left-outer
    *                  semantics)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, tieBreak: String,
               payload: Seq[String], direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val leftCols = left.columns.filterNot(keys.contains).toSeq

    // Packed right payload: non-null per right row even when individual
    // payload fields are null (see class doc).
    val pktFields = (col(rightTs).as("__ts") +: col(tieBreak).as("__tb") +:
      payload.map(col))
    val rightPart = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(0).as("__side"),
        struct(pktFields: _*).as("__pkt")): _*)
    val pktType = rightPart.schema("__pkt").dataType
    val leftPart = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__t"), lit(1).as("__side"),
        lit(null).cast(pktType).as("__pkt")) ++ leftCols.map(col): _*)
    // Union schemas must align column-for-column: give right rows null
    // slots for the left columns. ONE flat projection — a
    // foldLeft+withColumn per column nests an analyzer pass per Project
    // node, quadratic on wide left schemas.
    val rightAligned = rightPart.select(
      rightPart.columns.map(col).toSeq ++ leftCols.map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val ord =
      if (backward) Seq(col("__t").asc, col("__side").asc,
        col("__pkt.__tb").asc_nulls_first)
      else Seq(col("__t").desc, col("__side").asc,
        col("__pkt.__tb").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftPart.unionByName(rightAligned)
      .withColumn("__m", last(col("__pkt"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val inTol = tolerance match {
      case Some(tol) if backward =>
        col("__m").isNotNull && col("__m.__ts") >= col("__t") - tol
      case Some(tol) =>
        col("__m").isNotNull && col("__m.__ts") <= col("__t") + tol
      case None => col("__m").isNotNull
    }
    val out = keys.map(col) ++ leftCols.map(col) ++
      payload.map(p => when(inTol, col(s"__m.$p")).as(p))
    matched.select(out: _*)
  }
}
