package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Validate

class ValidateSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("checks fire on dirty data and stay quiet on clean data") {
    import spark.implicits._
    val dirty = Seq(
      (Some(1L), 5.0, "a@b.com"),
      (None, 5.0, "a@b.com"),        // null key
      (Some(2L), -3.0, "a@b.com"),   // out of range
      (Some(2L), 5.0, "nonsense"),   // bad format + dup key
      (Some(3L), 200.0, "x@y.org")   // out of range
    ).toDF("id", "qty", "email")
    val row = Validate.rowViolations(dirty, Seq(
      Validate.notNull("id"),
      Validate.inRange("qty", 0, 100),
      Validate.matches("email", "^[^@]+@[^@]+$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(row == Map("null_id" -> 1L, "range_qty" -> 2L, "format_email" -> 1L))

    val dup = Validate.duplicateKeys(dirty.filter(col("id").isNotNull), "dup_id", Seq("id"))
      .collect().head
    assert(dup.getString(0) == "dup_id" && dup.getLong(1) == 1L)

    val ref = Seq(1L, 2L).toDF("pk")
    val orph = Validate.orphans(dirty.filter(col("id").isNotNull), "orphan", "id", ref, "pk")
      .collect().head
    assert(orph.getLong(1) == 1L) // id=3 has no ref

    val report = Validate.report(
      Validate.rowViolations(dirty, Seq(Validate.notNull("id"))),
      Validate.duplicateKeys(dirty, "dup_id", Seq("id")))
    assert(report.columns.toSeq == Seq("check_name", "n_violations"))
    assert(report.count() == 2)
  }
}
