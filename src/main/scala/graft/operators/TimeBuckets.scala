package graft.operators

/** Exact floor-division bucket id as a SQL fragment, shared by the
  * bucketed temporal operators ([[RangeJoin]], [[IntervalJoin]],
  * [[Resample]]).
  *
  * SQL `div` truncates toward ZERO, so with negative inputs
  * `-1 div w == 0 == 0 div w` — values on either side of the origin
  * merge into bucket 0, and an equi-join on the bucket id then silently
  * drops matches whose interval straddles it (a wrong ANSWER, not an
  * error). Floor division fixes that: truncate, then subtract 1 when
  * the division was inexact and the operands' signs differ (`w` > 0
  * here, so "e < 0"). This post-correction form is also OVERFLOW-SAFE
  * across the entire Long domain (round-12 advice): the previous
  * `(e - pmod(e, w)) div w` underflowed for `e` within `w` of
  * `Long.MinValue` — the subtraction wrapped before the `div` ran,
  * yielding a wrong bucket id instead of an error — while `div` and `%`
  * alone cannot overflow for `w` > 0. Pure integer arithmetic, stays
  * inside whole-stage codegen (no float round-trip, no off-by-one at
  * epoch-scale longs).
  */
private[operators] object TimeBuckets {

  /** `floor(e / w)` over integral SQL expression `e`, width `w` > 0. */
  def floorBkt(e: String, w: Long): String =
    s"((($e) div ${w}L) - (CASE WHEN (($e) % ${w}L) != 0 " +
      s"AND ($e) < 0 THEN 1 ELSE 0 END))"
}
