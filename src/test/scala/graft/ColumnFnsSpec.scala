package graft

import graft.functions.ColumnFns
import org.apache.spark.sql.functions._

class ColumnFnsSpec extends SparkSpec {
  import spark.implicits._

  test("F7 formatHhmm matches the reference template filter") {
    // custom_filters.py:7-13: 1631.00 -> "16:31", 805.0 -> "08:05"
    val out = Seq(1631.0, 805.0, 0.0, 2359.0).toDF("t")
      .select(ColumnFns.formatHhmm($"t").as("s")).as[String].collect()
    assert(out.toSeq == Seq("16:31", "08:05", "00:00", "23:59"))
  }

  test("F6 normalizeLabel lowercases, strips punctuation, collapses runs") {
    // customers/views.py:37-47
    val out = Seq("TRAVEL & LEISUR", "  Meat--Products ", "a_b_c")
      .toDF("x").select(ColumnFns.normalizeLabel($"x").as("s"))
      .as[String].collect()
    assert(out.toSeq == Seq("travel leisur", "meat products", "a b c"))
  }

  test("F14 riskBand uses the reference's four bands") {
    // views.py:3506-3514: <=.25 Low, <=.5 Medium, <=.75 High, else Critical
    val out = Seq(0.1, 0.25, 0.26, 0.5, 0.75, 0.76).toDF("p")
      .select(ColumnFns.riskBand($"p").as("b")).as[String].collect()
    assert(out.toSeq ==
      Seq("Low", "Low", "Medium", "Medium", "High", "Critical"))
  }

  test("F9 pctChange guards division by zero") {
    val out = Seq((110.0, 100.0), (50.0, 0.0)).toDF("r", "p")
      .select(ColumnFns.pctChange($"r", $"p").as("c")).as[Double].collect()
    assert(math.abs(out(0) - 10.0) < 1e-9 && out(1) == 0.0)
  }

  test("F5 safeDiv returns 0 on zero denominator") {
    val out = Seq((10.0, 4.0), (10.0, 0.0)).toDF("n", "d")
      .select(ColumnFns.safeDiv($"n", $"d").as("q")).as[Double].collect()
    assert(out(0) == 2.5 && out(1) == 0.0)
  }

  test("F1/F2 quarter and season buckets") {
    val out = Seq(1, 4, 7, 12).toDF("m")
      .select(ColumnFns.quarterOfMonth($"m").as("q"),
        ColumnFns.seasonOfMonth($"m").as("s"))
      .as[(String, String)].collect()
    assert(out.toSeq == Seq(("Q1", "Winter"), ("Q2", "Spring"),
      ("Q3", "Summer"), ("Q4", "Winter")))
  }

  test("moneySum is exact and partition-order independent") {
    val vals = (1 to 10000).map(i => (i % 7, (i % 100) / 100.0 + 0.01))
    val a = vals.toDF("k", "v").repartition(13)
      .agg(ColumnFns.moneySum($"v")).head.getDouble(0)
    val b = vals.reverse.toDF("k", "v").repartition(3)
      .agg(ColumnFns.moneySum($"v")).head.getDouble(0)
    assert(a == b)
  }
}
