package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the write-time clustering that
  * makes MULTI-dimension predicates prunable from file-level min/max
  * statistics alone (the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`; Morton 1966).
  *
  * Why it matters at 100 TB: a table range-partitioned on ONE column
  * prunes scans on that column only — a predicate on a second column
  * still touches every file. Interleaving the bits of d columns into one
  * z-value and range-bucketing ON THE Z-VALUE gives every file a small
  * bounding BOX in the d-dim key space, so the ordinary per-file min/max
  * stats every columnar format already keeps (parquet row-group stats,
  * Delta file stats) prune predicates on ANY of the d dimensions —
  * no extra index structure, just row order.
  *
  * Everything here is exact integer bit arithmetic (shift/mask/or), so
  * the layout decision is engine-portable and oracle-checkable — the
  * same property the md5-bucket samplers rely on. Inputs are clamped to
  * `[0, 2^bits)` per dimension; callers quantize wider domains first
  * (e.g. `value div scale`), exactly as production z-ordering quantizes
  * to a fixed per-column bit budget.
  */
object Layout {

  /** Morton z-value of two dimensions at `bits` bits each: bit `i` of
    * `x` lands at position `2i`, bit `i` of `y` at `2i + 1` — a fold of
    * shift/mask/or terms that stays inside whole-stage codegen. Output
    * fits a BIGINT for `bits <= 31`. */
  /** The ONE clamp-to-domain rule (`[0, 2^bits)`) shared by the z-value
    * and the bounding-box stats — if they disagreed, the boxes would no
    * longer describe the values that produced the buckets. */
  private def clamp(c: Column, bits: Int): Column =
    least(lit((1L << bits) - 1), greatest(lit(0L), c.cast("long")))

  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val cx = clamp(x, bits); val cy = clamp(y, bits)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(cx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(cy, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
  }

  /** Assign each row its z-value and z-range bucket (`nBuckets` must be
    * a power of two — the bucket is the z-value's top bits, a pure shift
    * so the oracle needs no division-rounding care). The returned frame
    * is the write-layout decision: `repartitionByRange(col("zbucket"))`
    * + sort-within-partitions on `z` IS the z-ordered table. */
  def zOrderBuckets(df: DataFrame, x: Column, y: Column, bits: Int,
                    nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two: $nBuckets")
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    require(bucketBits <= 2 * bits, "more buckets than z-value bits")
    df.withColumn("z", zValue2(x, y, bits))
      .withColumn("zbucket", shiftright(col("z"), 2 * bits - bucketBits))
  }

  /** Per-bucket bounding boxes — the file-skipping evidence: for each
    * z-range bucket, the min/max of BOTH dimensions (what parquet/Delta
    * file stats would hold) plus the row count. The sum of box areas
    * over buckets, relative to the full domain area × nBuckets, is the
    * expected scan fraction for a uniformly-placed 2-dim point
    * predicate — z-ordering drives it toward 1/nBuckets on BOTH
    * dimensions at once, where single-column layout only shrinks one. */
  def zOrderStats(df: DataFrame, x: Column, y: Column, bits: Int,
                  nBuckets: Int): DataFrame = {
    zOrderBuckets(df, x, y, bits, nBuckets)
      .select(col("zbucket"), clamp(x, bits).as("__x"),
        clamp(y, bits).as("__y"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
  }
}
