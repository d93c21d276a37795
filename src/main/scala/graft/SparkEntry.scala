package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Flow
import graft.queries.Registry
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: WordCount over documents — the reference's canonical
    * example (flink_arch.drawio page "yarn per job 启动流程":
    * org.apache.flink.example.WordCount), run through the typed Flow API
    * (S8 source → T2 flatMap → T4 keyBy → T8 count). */
  def entry(spark: SparkSession): DataFrame = {
    Engine.tune(spark)
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    Flow.fromDataset(docs.select("text").as[String])
      .flatMap(_.split(" "))
      .filter(_.nonEmpty)
      .keyBy(identity)
      .count()
      .toDF
      .toDF("word", "cnt")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
