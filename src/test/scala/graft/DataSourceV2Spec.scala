package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** SURVEY §2.1 S5 — the DataSource V2 split-based source, batch and
  * microbatch sides. */
class DataSourceV2Spec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def read(rows: Long, parts: Int) =
    spark.read.format("synthetic-events")
      .option("rows", rows).option("numPartitions", parts)
      .option("seed", 42).load()

  test("batch read: row count, split planning, schema") {
    val df = read(1000, 7)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.columns.toSeq == Seq("event_id", "ts", "user_id", "event_type", "value"))
  }

  test("deterministic across reads and partitionings (split-independent)") {
    val a = read(500, 3).orderBy("event_id").collect().toSeq
    val b = read(500, 9).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("predicate + projection compose over the source") {
    val n = read(1000, 4).filter(col("event_type") === "click").select("event_id").count()
    assert(n > 0 && n < 1000)
  }

  test("microbatch stream delivers all rows across triggers") {
    val stream = spark.readStream.format("synthetic-events")
      .option("rows", 250).option("rowsPerBatch", 100)
      .option("numPartitions", 4).load()
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("synth_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // admission control paces 100+100+50; processAllAvailable drains all
      q.processAllAvailable()
      val total = spark.table("synth_stream").collect().head.getLong(0)
      assert(total == 250, s"got $total")
      assert(q.recentProgress.length >= 3, "expected >= 3 microbatches")
    } finally q.stop()
  }
}
