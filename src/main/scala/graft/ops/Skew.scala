package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE's runtime skew-join split
  * doesn't reach (streaming joins, aggregation hot keys, deliberate
  * pre-partitioning). AQE (enabled by Engine) remains the first line of
  * defense for batch sort-merge joins.
  */
object Skew {

  /** Salted equi-join: the probe side gets a uniform salt in [0, salt);
    * the (small, replicable) build side is exploded `salt`× so every
    * (key, salt) cell exists. Join output is identical to the plain
    * equi-join; the shuffle for a hot key now spreads over `salt`
    * partitions instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigS = big.withColumn("__salt", floor(rand(42) * salt).cast("int"))
    val smallS = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for hot grouping keys: pre-aggregate on
    * (key, salt), then combine per key. `partials` must be algebraic
    * (sum/count/min/max style) — supply both phases. */
  def saltedAgg(df: DataFrame, key: String, salt: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      combine: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt", floor(rand(42) * salt).cast("int"))
    combine(partial(salted.groupBy(col(key), col("__salt"))).groupBy(col(key)))
  }
}
