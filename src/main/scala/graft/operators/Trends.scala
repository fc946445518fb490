package graft.operators

import graft.functions.ColumnFns.{moneySum, stableRound}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType}

/** Time-window analytics (SURVEY §2.2 P5, §2.4 A17–A18, §2.8 F3/F9;
  * `Website/market/dunnhumby/views.py:146-161`, `views.py:694-729`,
  * `views.py:769-782`, `views.py:1943-1964`).
  *
  * The reference's time axis is an integer `day` (1..711); the testdata's
  * is a date/timestamp. Every operator here branches on the axis dtype so
  * BOTH work: numeric axes use the reference's literal arithmetic
  * (`max_day - N + 1`), date axes use date functions. "Last N days" is a
  * predicate (P5), not a sliding window — the max-day probe is one
  * single-row agg job, after which the main scan gets a pushable literal
  * predicate (shows up as PushedFilters in the parquet scan).
  */
object Trends {

  private def axisType(df: DataFrame, dayCol: Column): DataType =
    df.select(dayCol).schema.head.dataType

  /** Lower bound of the `last n days` window as a literal Column, resolved
    * eagerly (P5, `views.py:146-161`). */
  def windowStart(df: DataFrame, dayCol: Column, n: Int): Column =
    axisType(df, dayCol) match {
      case _: NumericType =>
        val maxDay = df.agg(max(dayCol)).head().get(0).toString.toDouble
        lit(maxDay - (n - 1))
      case _ =>
        val maxDay = df.agg(max(dayCol.cast("date"))).head().getDate(0)
        date_sub(lit(maxDay), n - 1)
    }

  /** Lazily attach the frame's max day as a constant `__md` column via a
    * one-row broadcast cross-join (BroadcastNestedLoopJoin — never a
    * CartesianProduct), returning the joined frame and a window-start
    * builder (n → lower-bound Column referencing `__md`). For operators
    * whose trailing windows live only inside conditional AGGREGATES
    * (no row filter) there is nothing to push down, so an eager
    * [[windowStart]] probe's only effect is a full serial scan job
    * before the real plan starts (~0.3 s × every draw of every
    * windowed-stats query at sf0.1); the lazy form runs the probe as a
    * broadcast future CONCURRENT with the main scan. Operators that
    * FILTER by the window ([[lastNDays]], [[periodComparison]]) keep
    * the eager literal probe deliberately: a literal bound reaches the
    * parquet scan as a PushedFilter — and prunes date partitions at
    * deployment scale — which is worth one cheap probe job. */
  def withMaxDay(df: DataFrame, dayCol: Column)
      : (DataFrame, Int => Column) =
    axisType(df, dayCol) match {
      case _: NumericType =>
        val md = broadcast(df.agg(max(dayCol).as("__md")))
        (df.crossJoin(md), n => col("__md") - (n - 1))
      case _ =>
        val md = broadcast(df.agg(max(dayCol.cast("date")).as("__md")))
        (df.crossJoin(md), n => date_sub(col("__md"), n - 1))
    }

  /** Window-start literals for SEVERAL windows from ONE max-day probe —
    * use this (not repeated [[windowStart]] calls) when a query needs
    * multiple trailing windows: each probe is a full-column scan job. */
  def windowStarts(df: DataFrame, dayCol: Column,
                   ns: Seq[Int]): Seq[Column] =
    axisType(df, dayCol) match {
      case _: NumericType =>
        val maxDay = df.agg(max(dayCol)).head().get(0).toString.toDouble
        ns.map(n => lit(maxDay - (n - 1)))
      case _ =>
        val maxDay = df.agg(max(dayCol.cast("date"))).head().getDate(0)
        ns.map(n => date_sub(lit(maxDay), n - 1))
    }

  /** P5 — the reference's period window: `day >= max_day - N + 1`
    * (`views.py:146-161`). Works on integer and date axes. */
  def lastNDays(df: DataFrame, dayCol: Column, n: Int): DataFrame =
    axisType(df, dayCol) match {
      case _: NumericType => df.where(dayCol >= windowStart(df, dayCol, n))
      case _ => df.where(dayCol.cast("date") >= windowStart(df, dayCol, n))
    }

  /** F3 — the reference's month bucket for an integer day axis:
    * `((day - origin) / 30) + 1` (`views.py:769-782`, origin 352). */
  def monthBucket(day: Column, origin: Int): Column =
    (((day - origin) / 30).cast("long") + 1)

  /** A18 — monthly trend buckets: per-month counts, sales, distinct actors
    * (`views.py:769-782`). Date axis buckets by calendar month; numeric
    * axis by the reference's `((day-origin)/30)+1` arithmetic. */
  def monthlyTrend(df: DataFrame, dayCol: Column, sales: Column,
                   actor: Column, basket: Column): DataFrame = {
    val bucket = axisType(df, dayCol) match {
      case _: NumericType => monthBucket(dayCol, 352).as("month")
      case _ => date_trunc("month", dayCol).cast("date").as("month")
    }
    df.groupBy(bucket)
      .agg(
        count(lit(1)).as("n_rows"),
        moneySum(sales).as("total_sales"),
        countDistinct(actor).as("n_actors"),
        countDistinct(basket).as("n_baskets"))
  }

  /** A17/F1 — quarter-bucket rollup: group by (category, quarter)
    * (`views.py:1943-1964`; integer-axis ranges `views.py:1548-1553`). */
  def quarterRollup(df: DataFrame, category: Column, dayCol: Column,
                    sales: Column): DataFrame = {
    val q = axisType(df, dayCol) match {
      case _: NumericType =>
        // reference buckets days 1-91/92-182/183-273/274+ (views.py:1946-1951)
        when(dayCol.between(1, 91), "Q1")
          .when(dayCol.between(92, 182), "Q2")
          .when(dayCol.between(183, 273), "Q3")
          .otherwise("Q4")
      case _ => concat(lit("Q"), quarter(dayCol))
    }
    df.groupBy(category.as("category"), q.as("quarter"))
      .agg(count(lit(1)).as("n_rows"), moneySum(sales).as("total_sales"))
  }

  /** F9 — period-over-period KPI: recent window vs the previous window of
    * equal length, percent change with zero-guard (`views.py:694-729`).
    * Single pass: conditional aggregation over one scan (A7 shape,
    * `ml_models.py:806-813`) instead of two separate scans. */
  def periodComparison(df: DataFrame, dayCol: Column, sales: Column,
                       n: Int): DataFrame = {
    val (d, recentLo, prevLo) = axisType(df, dayCol) match {
      case _: NumericType =>
        val maxDay = df.agg(max(dayCol)).head().get(0).toString.toDouble
        (dayCol, lit(maxDay - (n - 1)), lit(maxDay - (2 * n - 1)))
      case _ =>
        val maxDay = df.agg(max(dayCol.cast("date"))).head().getDate(0)
        (dayCol.cast("date"),
          date_sub(lit(maxDay), n - 1), date_sub(lit(maxDay), 2 * n - 1))
    }
    val recent = moneySum(when(d >= recentLo, sales).otherwise(lit(0.0)))
    val prev = moneySum(
      when(d >= prevLo && d < recentLo, sales).otherwise(lit(0.0)))
    df.where(d >= prevLo).agg(
      recent.as("recent_sales"),
      prev.as("prev_sales"),
      stableRound(when(prev =!= 0, (recent - prev) / prev * 100)
        .otherwise(lit(0.0)), 6).as("pct_change"))
  }

  /** A7 — multi-window conditional aggregation: one scan, per-key sums and
    * distinct-actor counts for each trailing window (`ml_models.py:806-813`,
    * `ml_models.py:984-995`). `windows` maps a label suffix to the window
    * length in days.
    *
    * Two-level aggregation (same shape as
    * [[Heuristics.productWindowStats]]): N windows of `count_distinct`
    * in one GROUP BY would plan as an Expand replicating every row N+1
    * times before the shuffle; instead level 1 reduces to the
    * (key, actor) grain — an actor is distinct-in-window iff their
    * LATEST day reaches the window start — and level 2 is a plain
    * aggregation. `key` and `actor` must be plain columns (they are
    * re-resolved by name against the level-1 result). */
  def multiWindowStats(df: DataFrame, key: Column, dayCol: Column,
                       sales: Column, actor: Column,
                       windows: Seq[(String, Int)]): DataFrame = {
    // lazy max-day ([[withMaxDay]]): the windows appear only inside
    // conditional aggregates, so there is no filter to push down and the
    // probe can ride the plan as a concurrent broadcast future. Level 1
    // carries `__md` (constant within the frame) so level 2's window
    // bounds resolve against its own input.
    val (dfm, loOf) = withMaxDay(df, dayCol)
    val starts = windows.map { case (nm, n) => nm -> loOf(n) }
    val d = axisType(df, dayCol) match {
      case _: NumericType => dayCol
      case _ => dayCol.cast("date")
    }
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val lvl1Aggs = Seq(max(d).as("__last_d"),
      max(col("__md")).as("__md")) ++
      starts.flatMap { case (nm, lo) =>
        Seq(
          sum(when(d >= lo, sales).otherwise(lit(0.0)).cast(dec))
            .as(s"__sv_$nm"),
          sum(when(d >= lo, 1L).otherwise(0L)).as(s"__tx_$nm"))
      }
    val lvl1 = dfm.groupBy(key, actor).agg(lvl1Aggs.head, lvl1Aggs.tail: _*)
    val aggs = starts.flatMap { case (nm, lo) =>
      Seq(
        sum(col(s"__sv_$nm")).cast("double").as(s"sales_$nm"),
        // isNotNull: COUNT(DISTINCT ...) never counts NULL, so the
        // null-actor group (one level-1 row) must not either
        sum(when(col("__last_d") >= lo && actor.isNotNull, 1L)
          .otherwise(0L)).as(s"actors_$nm"),
        sum(col(s"__tx_$nm")).as(s"tx_$nm"))
    }
    lvl1.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** Hierarchical ROLLUP totals over `dims` (grand total, per-dim1,
    * per-(dim1,dim2), …): `n_rows` + exact money sum per grouping level,
    * NULL marking the rolled-up dimension(s) — the drill-down report
    * shape every OLAP board asks of an aggregation engine. One pass:
    * Spark expands the rollup into a single Expand + hash aggregate
    * (rows replicated |dims|+1 times map-side, partial-agged before the
    * one exchange) — not |dims|+1 scans. Mirrors `GROUP BY ROLLUP` in
    * engine SQL. `gid` is the grouping bitmask (dims.head = MSB; leaf 0,
    * grand total 2^|dims|−1 — the same convention as engine
    * `GROUPING(dims…)`): it is what distinguishes a NATURAL null in a
    * dim from the rolled-up-subtotal null marker when nullable dims
    * produce both. */
  def rollupStats(df: DataFrame, dims: Seq[Column], sales: Column): DataFrame =
    df.rollup(dims: _*)
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
        moneySum(sales).as("total_sales"))

  /** Trailing event-time range-frame stats: for each row, the count and
    * exact money sum of the key's rows in `(ts - windowUs, ts]` —
    * the market-data rolling-window primitive (moving volume, trailing
    * revenue, burst detection). ONE key exchange + one sort; the range
    * frame is a linear two-pointer scan per partition, NOT a self-join
    * (the naive |rows|×|window| explosion). Ties: equal-ts rows share a
    * frame (RANGE semantics), so results are order-independent and an
    * engine SQL mirror (`RANGE BETWEEN n PRECEDING AND CURRENT ROW`)
    * hash-matches. `tsCol` must be integral event time (epoch micros);
    * the money sum is decimal-cast so float addition order cannot flake
    * the hash. */
  def rollingStats(df: DataFrame, keys: Seq[String], tsCol: String,
                   value: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rangeBetween(-(windowUs - 1), 0)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sales_window",
        sum(value.cast("decimal(18,2)")).over(w).cast("double"))
  }
}
