package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch mirror of
  * [[graft.streaming.Streams.sessionize]] (same semantics: a session
  * closes after `gap` of event-time silence; an event exactly `gap`
  * after its predecessor stays in the session, strictly more starts a
  * new one). The canonical event-log → training-conversation /
  * user-journey shaping step (clickstream funnels, chat threading,
  * trade-burst grouping).
  *
  * Spark-first plan: ONE hash exchange on the keys serves everything —
  * `lag` marks gap-exceeding rows, a running `sum` over the SAME window
  * ordering turns the marks into per-key session ordinals (two Window
  * operators, one sort, zero extra shuffles), and the final
  * `groupBy(keys :+ ordinal)` is a prefix of the window partitioning so
  * Catalyst plans it as a partial+final agg over the exchange already
  * in place. Per-key state never materializes beyond a task (contrast
  * the self-join formulations that explode |events|² per key).
  *
  * Tie safety: rows with equal timestamps order arbitrarily, but their
  * pairwise gap is 0 ≤ `gap`, so ties can never straddle a session
  * boundary and every output column (min/max/count) is
  * order-independent — the result is deterministic and an
  * engine-independent SQL oracle hash-matches it.
  *
  * 100 TB shape: the exchange partitions by key (user/instrument
  * grain — bounded per-key history), identical to [[AsofJoin]]'s
  * contract; the same time-bucketed two-level carry is the named escape
  * for a single pathological key.
  *
  * Contract: `tsCol` must be integral event time (epoch micros — cast
  * timestamps via `unix_micros` first) and non-null.
  */
object Sessionize {

  /** @return one row per (keys…, session_idx) with session_start,
    *         session_end, n_events, duration_us; session_idx is 1-based
    *         in per-key time order. */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
                 gap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val marked = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col(tsCol) - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_us"))
  }
}
