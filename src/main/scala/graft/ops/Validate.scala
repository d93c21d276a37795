package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the admission gate in front of a
  * training-data pipeline (null keys, out-of-range values, duplicate
  * keys, referential orphans poison everything downstream; count them
  * before they ship).
  *
  * Each check contributes one aggregate over a single scan shape:
  * row-predicate checks fold into ONE pass over the table (a sum of
  * codegen'd conditionals — adding a check adds no scan), while
  * uniqueness/referential checks are their own aggregation/anti-join
  * (those genuinely need a shuffle). Output: (check_name,
  * n_violations) — zero rows violated means the gate is green.
  */
object Validate {

  /** A named row-level violation predicate (true = row violates). */
  final case class Check(name: String, violation: Column)

  def notNull(c: String): Check = Check(s"null_$c", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))
  def matches(c: String, regex: String): Check =
    Check(s"format_$c", col(c).isNotNull && !col(c).rlike(regex))

  /** Row-predicate violations: ONE scan, one conditional-sum per check. */
  def rowViolations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => sum(when(c.violation, 1L).otherwise(0L)).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (check_name, n_violations)
    wide.selectExpr(
      s"stack(${checks.size}, " +
        checks.map(c => s"'${c.name}', ${c.name}").mkString(", ") +
        ") AS (check_name, n_violations)")
  }

  /** Duplicate-key violations: rows beyond the first per key. */
  def duplicateKeys(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential orphans: rows of `df` whose `fk` has no match in
    * `ref.pk` (left-anti join — broadcast when ref is a dim). */
  def orphans(df: DataFrame, name: String, fk: String,
              ref: DataFrame, pk: String): DataFrame =
    df.select(col(fk)).join(ref.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Full report: union of all check families. */
  def report(parts: DataFrame*): DataFrame = parts.reduce(_.unionAll(_))
}
