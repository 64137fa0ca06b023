package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (the pair tier of Agrawal &
  * Srikant's Apriori): which items co-occur in the same basket more
  * often than `minSupport` times.
  *
  * Scale shape: the per-basket pair blowup is quadratic in BASKET size,
  * not corpus size — baskets (orders, sessions, documents) are small by
  * construction, so the self-join on the basket key is a co-partitioned
  * equi-join: one shuffle of the deduplicated item list, pairs expand
  * inside each partition, and the (a, b) counts reduce map-side. The
  * `a < b` orientation halves the pair stream and canonicalizes it.
  */
object Association {

  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val items = df.select(col(basketCol).as("__bk"), col(itemCol).as("item_a"))
      .distinct()
    val b = items.select(col("__bk"), col("item_a").as("item_b"))
    items.join(b, Seq("__bk"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Item-to-item co-occurrence recommendations: directed frequent
    * pairs scored by LIFT in exact ppm — support·N·1e6 div (n_a·n_b),
    * the PMI-style normalization that stops popular items from
    * dominating every list — and cut to the top-k per source item.
    * The basket-count is a single-row broadcast (bnljAllowed); the
    * marginals table is item-sized and broadcasts. */
  def recommendPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1 && k >= 1)
    import org.apache.spark.sql.expressions.Window
    val items = df.select(col(basketCol).as("__bk"), col(itemCol).as("item_a"))
      .distinct()
    val nb = items.agg(countDistinct(col("__bk")).as("__n_baskets"))
    val s = items.groupBy(col("item_a").as("__it"))
      .agg(count(lit(1)).as("__n"))
    val b = items.select(col("__bk"), col("item_a").as("item_b"))
    val pairs = items.join(b, Seq("__bk"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val w = Window.partitionBy(col("item_a"))
      .orderBy(col("lift_ppm").desc, col("item_b").asc)
    pairs
      .join(broadcast(s.select(col("__it").as("item_a"), col("__n").as("__na"))),
        Seq("item_a"))
      .join(broadcast(s.select(col("__it").as("item_b"), col("__n").as("__nb"))),
        Seq("item_b"))
      .crossJoin(broadcast(nb))
      .withColumn("lift_ppm",
        expr("support * __n_baskets * 1000000L div (__na * __nb)"))
      .withColumn("rec_rank", row_number().over(w).cast("long"))
      .filter(col("rec_rank") <= k)
      .select(col("item_a"), col("item_b"), col("support"),
        col("lift_ppm"), col("rec_rank"))
  }
}
