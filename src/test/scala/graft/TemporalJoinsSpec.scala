package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("asofJoin picks most recent right row <= ts, equal ts matches, none -> null") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0)).toDF("k", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("price"))
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(out == Map(
      "a" -> 100.0,  // equal ts matches
      "b" -> 150.0,  // most recent of the two
      "c" -> -1.0,   // before any right row
      "d" -> -1.0))  // other key
  }

  test("asofJoin carries genuinely-null payload fields (no stale value)") {
    val left = Seq((1L, 5L, "row")).toDF("k", "ts", "tag")
    val right = Seq((1L, 1L, Some(10.0)), (1L, 3L, None)).toDF("k", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("price")).collect().head
    assert(out.isNullAt(3), s"stale value carried: $out") // ts=3 row's null price wins
  }

  test("asofJoin never matches null keys (SQL equality semantics)") {
    val left = Seq((Option.empty[Long], 5L, "l")).toDF("k", "ts", "tag")
    val right = Seq((Option.empty[Long], 3L, 9.0)).toDF("k", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("price")).collect().head
    assert(out.isNullAt(3), "null keys matched each other")
  }

  test("asofJoin never matches null-timestamp rows on either side") {
    // a null-ts right row sorts nulls-first and would otherwise leak its
    // payload onto left rows that have no real prior match (DuckDB ASOF
    // never matches a NULL ts); a null-ts left row must get no match.
    val left = Seq((1L, Some(5L), "early"), (1L, Some(20L), "late"), (1L, None, "nullts"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, None, 666.0), (1L, Some(10L), 100.0)).toDF("k", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("price"))
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(out == Map(
      "early" -> -1.0,   // before the only real right row; null-ts row must NOT leak
      "late" -> 100.0,
      "nullts" -> -1.0)) // null-ts probe matches nothing
  }

  test("asofJoin rejects value-column name collisions") {
    val df = Seq((1L, 2L, 3.0)).toDF("k", "ts", "price")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(df, df, "k", "ts", Seq("price"))
    }
  }

  test("rangeJoin: inverted interval yields nothing (no bucket explosion)") {
    val points = Seq((1L, 50L)).toDF("k", "p")
    val bad = Seq((1L, 1700000000000L, 0L, "corrupt")).toDF("k", "lo", "hi", "name")
    assert(TemporalJoins.rangeJoin(points, bad, "k", "p", "lo", "hi", 1000L).count() == 0)
  }

  test("rangeJoin: fractional bounds keep edge matches") {
    val points = Seq((1L, 6.2)).toDF("k", "p")
    val iv = Seq((1L, 5.5, 6.5, "i")).toDF("k", "lo", "hi", "name")
    assert(TemporalJoins.rangeJoin(points, iv, "k", "p", "lo", "hi", 2L).count() == 1)
  }

  test("rangeJoin equals naive cross-join filter") {
    val points = (0L until 200L).map(i => (i % 3, i)).toDF("k", "p")
    val intervals = Seq((0L, 10L, 50L, "i1"), (1L, 40L, 45L, "i2"), (0L, 190L, 400L, "i3"),
      (2L, 0L, 200L, "i4")).toDF("k", "lo", "hi", "name")
    val fast = TemporalJoins.rangeJoin(points, intervals, "k", "p", "lo", "hi", bucketWidth = 16)
      .select("k", "p", "name").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("k", "p", "name").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fast == naive && fast.nonEmpty)
  }
}
