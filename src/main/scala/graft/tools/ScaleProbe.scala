package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe: pushes ~10M synthetic events (DSv2 source, 64 splits)
  * through the engine's heavier operator shapes to validate the plans
  * at ~100x the sf0.1 events volume: windowed agg, sessionization,
  * as-of join, grouped top-k. Prints one timing line per stage.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = graft.Engine.session("scale-probe")
    val ev = spark.read.format("synthetic-events")
      .option("rows", rows).option("numPartitions", 64).load()
      .withColumn("ts_ns", unix_micros(col("ts")) * 1000)

    def stage(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    stage("window_agg") {
      ev.groupBy((expr("ts_ns div 600000000000") * 600).as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
    }
    stage("sessionize") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      ev.withColumn("new_s",
          when(col("ts_ns") - lag("ts_ns", 1).over(w) > 1800000000000L
            || lag("ts_ns", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sid", sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
    }
    stage("asof_join") {
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts_ns").agg(max("event_id").as("pid"))
        .withColumn("pts", col("ts_ns"))
      graft.ops.TemporalJoins.asofJoin(
        ev.select("event_id", "user_id", "ts_ns"), purchases, "user_id", "ts_ns", Seq("pid", "pts"))
    }
    stage("grouped_topk") {
      graft.plans.GroupedTopK(
        ev.select("user_id", "event_id", "value"), Seq("user_id"), 5,
        Seq(("value", true), ("event_id", false)))
    }
    spark.stop()
  }
}
