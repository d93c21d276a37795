package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-generated parquet dirs
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, schemas in FIXTURES.md).
  *
  * Plays the role of the reference's source-creation path
  * (`ExecutionEnvironment::readTextFile` → `DataSource`,
  * reference: ExecutionEnviromentreadTextFile创建DataSource分析.md:53-96):
  * schema is declared at the source (`TypeInformation` ≙ parquet footer
  * schema / explicit `StructType`), split planning is Spark's FileScan.
  */
final class Tables(spark: SparkSession, dir: String) {

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** The engine contract for event time is microsecond precision:
    * `ts_ns` is µs-truncated nanos-since-epoch (exact integer
    * arithmetic), `ts` the equivalent `timestamp_ntz` — regardless of
    * how the generator wrote the column. Two generator layouts exist:
    * TIMESTAMP(NANOS) (rounds ≤4; Spark reads it as a nanos LONG under
    * `nanosAsLong`, DuckDB truncates it to µs on read) and
    * TIMESTAMP(MICROS) (round 5+; both engines read it natively). Both
    * normalize to the same two columns, so every downstream query and
    * oracle is layout-independent. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.withColumn("ts_ns", expr("(ts div 1000) * 1000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => // TIMESTAMP(MICROS), ntz; session TZ is UTC so the cast is exact
        raw.withColumn("ts_ns", expr("unix_micros(cast(ts AS timestamp)) * 1000"))
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  def all: Map[String, DataFrame] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Register every table as a temp view so queries can run via
    * `spark.sql` with the same table names the DuckDB oracle uses. */
  def registerAll(): Unit = all.foreach { case (n, df) => df.createOrReplaceTempView(n) }
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
