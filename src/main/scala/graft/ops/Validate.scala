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

  /** Row-predicate violations: ONE scan, one conditional-sum per check.
    * coalesce keeps empty-input counts at 0 (sum over zero rows is
    * null), matching the SQL count(CASE...) the oracle uses. */
  def rowViolations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "rowViolations: empty check list")
    require(checks.map(_.name).distinct.size == checks.size,
      s"rowViolations: duplicate check names in ${checks.map(_.name)}")
    // synthetic aliases c0..cN so check names never meet a SQL parser
    // (dots/quotes/spaces in names are legal)
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(s"c$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"c$i").as("n_violations"))
    }
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.check_name"), col("e.n_violations"))
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
  def report(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "report: no check results to combine")
    parts.reduce(_.unionAll(_))
  }
}
