package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SURVEY §2.1 S8 — file formats beyond text: csv and json round-trips
  * through the engine's read path, and the streaming parquet
  * file-monitor pipeline over real event rows (FIXTURES streaming
  * recipe: replayed parquet slices, window agg, watermark). */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("csv with header round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val src = graft.sources.Tables(spark, TestSession.sf0001).nation
    src.write.option("header", "true").mode("overwrite").csv(s"$dir/nation.csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation.csv")
    assert(back.count() == 25)
    assert(back.columns.toSeq == src.columns.toSeq)
  }

  test("json lines round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val src = graft.sources.Tables(spark, TestSession.sf0001).region
    src.write.mode("overwrite").json(s"$dir/region.json")
    val back = spark.read.json(s"$dir/region.json")
    assert(back.count() == 5)
    assert(back.select("r_name").distinct().count() == 5)
  }

  test("orc round-trips with pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = graft.sources.Tables(spark, TestSession.sf0001).lineitem
      .select("l_orderkey", "l_quantity", "l_returnflag")
    src.write.mode("overwrite").orc(s"$dir/li.orc")
    val back = spark.read.orc(s"$dir/li.orc").filter(col("l_returnflag") === "A")
    assert(back.count() == src.filter(col("l_returnflag") === "A").count())
    val plan = back.queryExecution.executedPlan.toString
    val pushed = plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pushed.contains("l_returnflag"),
      s"orc pushdown missing (PushedFilters=[$pushed]):\n$plan")
  }

  test("partitioned parquet layout prunes partitions at planning time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = graft.sources.Tables(spark, TestSession.sf0001).events
      .select("event_id", "user_id", "event_type", "value")
    graft.api.Flow.fromDataset(events.as[(Long, Long, String, Double)])
      .sinkParquetPartitioned(dir, "event_type")

    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
    // the partition filter is a planning-time PartitionFilter, and the
    // executed scan reads only the purchase directory's file (1 of 5)
    val qe = pruned.queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("event_type"),
      s"partition filter missing from scan:\n$plan")
    qe.executedPlan.execute().count() // run THIS plan instance to fill metrics
    val scan = qe.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value == 1,
      s"expected 1 pruned file, read ${scan.metrics("numFiles").value}")
  }

  test("W1/S3: parquet file-monitor stream over event slices + window agg") {
    import org.apache.spark.sql.streaming.OutputMode
    val srcDir = java.nio.file.Files.createTempDirectory("graft-evstream").toString
    // watermarks need TIMESTAMP (ltz) — cast NTZ, identity under UTC
    val events = graft.sources.Tables(spark, TestSession.sf0001).events
      .select(col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // two timestamp-ordered slices = two discovered files ≙ two monitor ticks
    val rows = events.orderBy("ts").limit(400).cache()
    rows.limit(200).write.mode("overwrite").parquet(s"$srcDir/slice1")
    rows.orderBy("ts").collect() // force cache before second write
    rows.except(rows.limit(200)).write.mode("overwrite").parquet(s"$srcDir/slice2")

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/slice*")
    val agg = graft.streaming.Streams.tumblingAgg(
      stream, "ts", "1 hour", "1 hour", Seq("event_type"),
      Seq(count(lit(1)).as("n"), sum("value").as("total")))
    val q = agg.writeStream.format("memory").queryName("ev_file_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val total = spark.table("ev_file_stream").groupBy("window", "event_type")
        .agg(max("n").as("n")).agg(sum("n")).collect().head.getLong(0)
      assert(total == 400, s"streamed rows: $total")
    } finally q.stop()
  }
}
