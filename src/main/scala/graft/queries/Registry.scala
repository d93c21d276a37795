package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle query. The driver runs
  * `run` at sf0.01, the oracle in DuckDB, and hash-compares canonicalized
  * results — column names must match exactly on both sides.
  *
  * @param bench whether Bench includes this query in the timed set
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    bench: Boolean = true)(
    val run: (SparkSession, String) => DataFrame)

object Registry {
  lazy val all: Seq[QueryDef] =
    Relational.defs ++ EventQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ MultimodalQueries.defs ++
      PackQueries.defs ++ GraphQueries.defs ++ TpchQueries.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
