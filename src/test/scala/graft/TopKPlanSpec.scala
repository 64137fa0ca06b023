package graft

import graft.plans.TopK

import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkTestBase {
  import spark.implicits._

  test("TopKPerKey equals the window formulation exactly") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val custom = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    // the reference MUST stay a genuine window plan: this drop-rank
    // shape is exactly what TopKRewrite targets, so disable the rule
    // or the test compares the operator against itself
    spark.conf.set(graft.plans.TopKRewrite.EnabledConf, "false")
    try {
      val viaWindow = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).drop("rn")
      assert(viaWindow.queryExecution.executedPlan.toString.contains("Window"),
        "reference plan must be the real window formulation")
      assert(custom.count() == viaWindow.count())
      assert(custom.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(custom).isEmpty)
    } finally spark.conf.unset(graft.plans.TopKRewrite.EnabledConf)
  }

  test("TopKRewrite: the drop-rank window idiom plans as TopKPerKeyExec") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    graft.plans.TopK.register(spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val idiom = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    // MATERIALIZE the rewritten result BEFORE flipping the kill-switch:
    // Datasets are lazy, so comparing two live frames after disabling
    // the rule would re-plan both as windows and compare the window
    // plan against itself (r4 review finding)
    val rewrittenRows = idiom.collect().map(_.toSeq).toSet
    spark.conf.set(graft.plans.TopKRewrite.EnabledConf, "false")
    try {
      val ref = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).drop("rn")
      assert(ref.queryExecution.executedPlan.toString.contains("Window"))
      assert(rewrittenRows == ref.collect().map(_.toSeq).toSet)
    } finally spark.conf.unset(graft.plans.TopKRewrite.EnabledConf)
  }

  test("TopKRewrite fuzz: random data and k, rewritten rows == window rows") {
    graft.plans.TopK.register(spark)
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 200 + rnd.nextInt(300)
      // unique tiebreak column => total order => both plans select the
      // same SET regardless of physical row order
      val data = (0 until n).map(i =>
        (rnd.nextInt(20).toLong, rnd.nextInt(50).toDouble, i.toLong))
      val df = data.toDF("k", "v", "tie")
      val kk = 1 + rnd.nextInt(5)
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"tie".asc)
      val idiom = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= kk).drop("rn")
      assert(idiom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = idiom.collect().map(_.toSeq).toSet
      spark.conf.set(graft.plans.TopKRewrite.EnabledConf, "false")
      val ref = try {
        df.withColumn("rn", row_number().over(w))
          .filter($"rn" <= kk).drop("rn").collect().map(_.toSeq).toSet
      } finally spark.conf.unset(graft.plans.TopKRewrite.EnabledConf)
      assert(got == ref, s"k=$kk n=$n: rewrite selected different rows")
    }
  }

  test("TopKRewrite: rn = 1 (latest-per-key) rewrites; kept rank does NOT") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    graft.plans.TopK.register(spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey".desc)
    val latest = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(latest.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(latest.count() ==
      orders.select($"o_custkey").distinct().count())
    // rank kept in the output => the rewrite must NOT fire
    val ranked = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
    val rankedPlan = ranked.queryExecution.executedPlan.toString
    assert(!rankedPlan.contains("TopKPerKey") && rankedPlan.contains("Window"),
      s"rewrite fired on a query that OBSERVES the rank:\n$rankedPlan")
  }

  test("physical plan: TopKPerKeyExec with one hash exchange, no Sort") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val custom = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false)), k = 2)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("hashpartitioning(o_custkey"), plan)
    assert(!plan.contains("Sort "), s"custom operator should not sort:\n$plan")
  }

  test("edge cases: k larger than group, ties, empty input") {
    val df = Seq((1L, 10.0, 100L), (1L, 10.0, 101L), (1L, 5.0, 102L), (2L, 1.0, 103L))
      .toDF("k", "v", "id")
    val got = TopK.perKey(df, Seq("k"), Seq(("v", false), ("id", true)), k = 10)
    assert(got.count() == 4) // k > group size keeps everything
    val top2 = TopK.perKey(df, Seq("k"), Seq(("v", false), ("id", true)), k = 2)
      .filter($"k" === 1).select("id").as[Long].collect().toSet
    assert(top2 == Set(100L, 101L)) // tie on v broken by id asc
    val empty = TopK.perKey(df.limit(0), Seq("k"), Seq(("v", false)), k = 2)
    assert(empty.count() == 0)
  }

  test("spill fallback: keys ~ rows under a tiny heap budget matches the window plan") {
    // near-unique keys (the exact-dedup shape that OOMs an unbounded
    // map) + a 4 KB heap budget => every partition takes the external
    // sort-based path; results must be identical to the heap path.
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    spark.conf.set(TopK.SpillThresholdConf, "4096")
    try {
      val spilled = TopK.perKey(orders, Seq("o_orderkey"),
        Seq(("o_totalprice", false)), k = 1)
      assert(spilled.queryExecution.executedPlan.toString.contains("4096"),
        "threshold not carried into the physical plan")
      assert(spilled.count() == orders.count()) // unique key => all rows kept
      // and a real top-k per repeated key, both paths agreeing:
      val viaSpill = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      spark.conf.unset(TopK.SpillThresholdConf)
      val viaHeap = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      assert(viaSpill.exceptAll(viaHeap).isEmpty && viaHeap.exceptAll(viaSpill).isEmpty)
    } finally spark.conf.unset(TopK.SpillThresholdConf)
  }

  test("two-phase: partial TopK below the exchange, final above") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val custom = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
    val plan = custom.queryExecution.executedPlan.toString
    // children print BELOW parents: partial must sit under the exchange
    val exch = plan.indexOf("Exchange hashpartitioning")
    val partial = plan.indexOf("TopKPerKeyPartial")
    assert(exch >= 0, s"no hash exchange:\n$plan")
    assert(plan.indexOf("Exchange hashpartitioning", exch + 1) < 0,
      s"expected exactly one exchange:\n$plan")
    assert(partial > exch, s"no partial TopK below the exchange:\n$plan")
  }

  test("deterministic across partitionings") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val a = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      .orderBy("o_custkey", "o_orderkey").collect()
    val b = TopK.perKey(orders.repartition(17), Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      .orderBy("o_custkey", "o_orderkey").collect()
    assert(a.sameElements(b))
  }
}
