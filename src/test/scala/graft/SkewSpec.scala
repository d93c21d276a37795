package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 5 else 1L, i))
    .toDF("k", "v")
  private lazy val dim = (0L to 4L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin output equals plain join on skewed data") {
    val plain = big.join(dim, "k").agg(count(lit(1)), sum("v")).collect().head
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8).agg(count(lit(1)), sum("v")).collect().head
    assert(plain == salted)
  }

  test("saltedAgg equals direct aggregation") {
    val direct = big.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(big, "k", salt = 8)(
      _.agg(sum("v").as("ps"), count(lit(1)).as("pn")),
      _.agg(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == salted)
  }

  test("WeightedAvg aggregator matches closed form") {
    val wavg = udaf(graft.ops.Aggregators.WeightedAvg)
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("x", "w")
    val got = df.agg(wavg(col("x"), col("w"))).collect().head.getDouble(0)
    assert(math.abs(got - 17.5) < 1e-12)
  }
}
