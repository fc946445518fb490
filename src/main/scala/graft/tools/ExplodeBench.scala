package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pair/triple-explosion shape A/B (r17): the rules family enumerates
  * per-basket ordered combinations with NESTED HIGHER-ORDER FUNCTIONS
  * (`flatten(transform(... slice ...))` building `named_struct`s).
  * Every higher-order function is `CodegenFallback` in Spark, so the
  * explosion stage — the CPU center of q_pair_counts / q_rule_matches /
  * the rules family (profile ledger: three ~1.6 s 32-task stages off a
  * 22 MB checkpoint) — evaluates interpreted, allocating lambda frames
  * and structs per combination. The alternative shape chains
  * posexplode/explode GENERATORS over `slice`, which stays entirely
  * inside whole-stage codegen (GenerateExec supports codegen for
  * ExplodeBase; slice/size are ordinary codegen expressions).
  *
  * Runs both shapes over the exact q_rule_matches basket input (brand
  * grain) and the q_pair_counts input (partkey grain), checksums the
  * aggregated output (count + hash sum) to prove identical results, and
  * prints wall seconds + job counts per rep.
  *
  * Usage: `runMain graft.tools.ExplodeBench <sfDir> [reps]`.
  */
object ExplodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val brandTx = lineitem
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand"))), Seq("l_partkey"))
      .where(col("p_brand").isNotNull)
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
    val partTx = lineitem.where(col("l_partkey").isNotNull)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))

    def baskets(tx: DataFrame): DataFrame = tx
      .repartition(spark.sparkContext.defaultParallelism, col("basket"))
      .groupBy(col("basket"))
      .agg(array_sort(collect_set(col("item"))).as("items"))
      .where(size(col("items")).between(2, 500))
      .localCheckpoint(true)

    // ---- shapes under test -------------------------------------------
    def hofPairs(b: DataFrame): DataFrame = b
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)), y ->
          |    named_struct('item_a', x, 'item_b', y))))""".stripMargin))
        .as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_baskets"))

    def genPairs(b: DataFrame): DataFrame = b
      .select(col("items"), posexplode(col("items")).as(Seq("i", "item_a")))
      .select(col("item_a"), explode(slice(col("items"), col("i") + lit(2),
        size(col("items")))).as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_baskets"))

    def hofTriples(b: DataFrame): DataFrame = b
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  flatten(transform(slice(items, i + 2, size(items)), (y, j) ->
          |    transform(slice(items, i + j + 3, size(items)), z ->
          |      named_struct('item_a', x, 'item_b', y, 'item_c', z))))))"""
          .stripMargin))
        .as("t"))
      .select(col("t.item_a"), col("t.item_b"), col("t.item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("triple_baskets"))

    def genTriples(b: DataFrame): DataFrame = b
      .select(col("items"), posexplode(col("items")).as(Seq("i", "item_a")))
      .select(col("items"), col("i"), col("item_a"),
        posexplode(slice(col("items"), col("i") + lit(2),
          size(col("items")))).as(Seq("j", "item_b")))
      .select(col("item_a"), col("item_b"),
        explode(slice(col("items"), col("i") + col("j") + lit(3),
          size(col("items")))).as("item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("triple_baskets"))

    // ---- checksum: count + sum of per-row hash (order-free) ----------
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val cols = df.columns.map(col).toSeq
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(cols: _*).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("h")).head()
      (r.getLong(0), r.getDecimal(1))
    }

    for ((grain, tx) <- Seq("brand" -> brandTx, "partkey" -> partTx)) {
      val b = baskets(tx)
      val shapes: Seq[(String, () => DataFrame)] = Seq(
        ("hof_pairs", () => hofPairs(b)),
        ("gen_pairs", () => genPairs(b)),
        ("hof_triples", () => hofTriples(b)),
        ("gen_triples", () => genTriples(b)))
      val sigs = scala.collection.mutable.Map[String, (Long, java.math.BigDecimal)]()
      for ((name, mk) <- shapes; r <- 1 to reps) {
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val s = sig(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[explode] $grain $name rep$r wall=$dt%.3f s " +
          f"jobs=${jobs.get() - j0} rows=${s._1} hash=${s._2}")
        // every rep must reproduce the shape's first-rep checksum —
        // last-wins would let a nondeterministic early rep slip past
        // the cross-shape requires below (r17 advice #1)
        sigs.get(name) match {
          case None => sigs(name) = s
          case Some(f) => require(f == s,
            s"$grain $name rep$r nondeterministic: $s vs $f")
        }
      }
      require(sigs("hof_pairs") == sigs("gen_pairs"),
        s"$grain pair shapes disagree: ${sigs("hof_pairs")} vs " +
          s"${sigs("gen_pairs")}")
      require(sigs("hof_triples") == sigs("gen_triples"),
        s"$grain triple shapes disagree: ${sigs("hof_triples")} vs " +
          s"${sigs("gen_triples")}")
      b.unpersist()
    }
    spark.stop()
  }
}
