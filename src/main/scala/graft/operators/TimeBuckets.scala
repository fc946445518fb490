package graft.operators

/** Exact floor-division bucket id as a SQL fragment, shared by the
  * bucketed temporal operators ([[RangeJoin]], [[IntervalJoin]],
  * [[Resample]]).
  *
  * SQL `div` truncates toward ZERO, so with negative inputs
  * `-1 div w == 0 == 0 div w` — values on either side of the origin
  * merge into bucket 0, and an equi-join on the bucket id then silently
  * drops matches whose interval straddles it (a wrong ANSWER, not an
  * error). Subtracting `pmod` (always in `[0, w)`, unlike `%`) first
  * makes the dividend an exact multiple of `w`, so the following `div`
  * IS floor division — correct across the whole integral domain,
  * including negative epochs, while staying pure integer arithmetic
  * inside whole-stage codegen (no float round-trip, no off-by-one at
  * epoch-scale longs).
  */
private[operators] object TimeBuckets {

  /** `floor(e / w)` over integral SQL expression `e`, width `w` > 0. */
  def floorBkt(e: String, w: Long): String =
    s"((($e) - pmod(($e), ${w}L)) div ${w}L)"
}
