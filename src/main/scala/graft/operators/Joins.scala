package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaped operators (SURVEY §2.3 J4–J8, §2.7 U3–U4).
  *
  * All of the reference's joins are equi-joins against small dimensions
  * (product 92K rows, household/segments 2.5K), so the Spark-first shape is
  * a broadcast hash join — no shuffle of the fact table. EXISTS/NOT-IN
  * subqueries become left-semi / left-anti joins, which Spark also
  * broadcasts when the subquery side is small: the fact scan streams once.
  */
object Joins {

  /** J1/J4/J5 — fact ⟕ small dimension, broadcast
    * (`analytics.py:32-41`, `views.py:1638-1645`, `ml_models.py:297-299`). */
  def enrich(fact: DataFrame, dim: DataFrame, key: String,
             how: String = "left"): DataFrame =
    fact.join(broadcast(dim), Seq(key), how)

  /** J8 — FK-existence filter: keep fact rows whose key exists in the
    * dimension (`import_transactions.py:155-157` importer FK check). */
  def fkExists(fact: DataFrame, factKey: String, dim: DataFrame,
               dimKey: String): DataFrame =
    fact.join(broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_semi")

  /** Inverse of [[fkExists]] — FK violations (rows with no parent). */
  def fkViolations(fact: DataFrame, factKey: String, dim: DataFrame,
                   dimKey: String): DataFrame =
    fact.join(broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_anti")

  /** J7 — EXISTS: baskets containing an item matching each of the given
    * predicates (ALL must hold; `validate_results.py:84-90` checks a basket
    * has both TRAVEL & LEISUR and MEAT). One semi-join per predicate. */
  def basketsContainingAll(items: DataFrame, basket: String,
                           preds: Seq[Column]): DataFrame =
    preds.foldLeft(items.select(col(basket)).distinct()) { (acc, p) =>
      acc.join(items.where(p).select(col(basket)).distinct(),
        Seq(basket), "left_semi")
    }

  /** U3 — churn-style set-membership label: 1 when the key has NO row in
    * `future`, else 0 (`analytics.py:495-500`). Left join against the
    * distinct future key set — null marks absence. */
  def absenceLabel(keys: DataFrame, key: String, future: DataFrame,
                   labelName: String): DataFrame = {
    val present = future.select(col(key)).distinct()
      .withColumn("__present", lit(1))
    keys.join(present, Seq(key), "left")
      .withColumn(labelName,
        when(col("__present").isNull, 1L).otherwise(0L))
      .drop("__present")
  }

  /** J6 — multi-horizon future-existence labels: for each (key) and each
    * horizon window (start, end] over `day`, a 0/1 column saying whether
    * any future row exists (`ml_models.py:263-293`). One pass over the
    * future table with conditional aggregation — NOT four separate
    * semi-joins: at 100 TB this is a single shuffle on the key. */
  def futureExistenceLabels(base: DataFrame, future: DataFrame, key: String,
                            horizons: Seq[(String, Column)]): DataFrame = {
    val aggs = horizons.map { case (nm, cond) =>
      max(when(cond, 1L).otherwise(0L)).as(nm)
    }
    val flags = future.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    horizons.foldLeft(base.join(flags, Seq(key), "left")) {
      case (d, (nm, _)) => d.withColumn(nm, coalesce(col(nm), lit(0L)))
    }
  }

  /** U4 — candidate-set union / intersection on a key column
    * (`customers/views.py:128-137`). */
  def unionKeys(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.select(col(key)).union(b.select(col(key))).distinct()
  def intersectKeys(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.select(col(key)).distinct()
      .join(b.select(col(key)).distinct(), Seq(key), "left_semi")

  /** Skew-salted equi-join: spreads each hot key of `big` over `nSalts`
    * shuffle partitions by salting the big side deterministically (hash of
    * the whole row) and replicating the small side once per salt value.
    * Result is identical to `big.join(small, keys)` (inner).
    *
    * When to reach for this: Spark 4's AQE skew-join
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default) already splits
    * skewed SORT-MERGE partitions at runtime and is the first line of
    * defense. Manual salting remains for the cases AQE cannot rewrite —
    * a skewed join feeding a same-keyed aggregation (AQE's split would be
    * undone by the next shuffle), stream-static joins, or a forced
    * shuffled-hash join. Replication cost: `small` is duplicated
    * `nSalts`×, so keep `nSalts` ≈ the hot-key multiplicity over the
    * average, not the partition count. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int): DataFrame = {
    require(nSalts > 0 && !big.columns.contains("__salt")
      && !small.columns.contains("__salt"),
      "saltedJoin: nSalts must be positive and inputs must not already " +
        "have a __salt column")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedBig.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }
}
