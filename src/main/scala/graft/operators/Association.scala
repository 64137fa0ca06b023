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
}
