package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch: phase decomposition of a simple bench query — how much is
  * table registration, planning, scan, and the noop write. */
object QProbe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[qp] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("q-probe")
    (1 to 3).foreach { round =>
      System.err.println(s"[qp] --- round $round ---")
      val tt = t("Tables+registerAll")({ val x = Tables(spark, sfDir); x.registerAll(); x })
      val df = t("sql parse+analyze")(spark.sql(
        """SELECT nullif(l_returnflag, 'A') AS rf, count(*) AS n, sum(l_quantity) AS qty
          |FROM lineitem GROUP BY 1""".stripMargin))
      t("q2n noop write")(df.write.format("noop").mode("overwrite").save())
      val li = tt.lineitem
      t("bare scan 2cols noop")(li.select("l_returnflag", "l_quantity")
        .write.format("noop").mode("overwrite").save())
      t("bare scan count")(li.count())
      t("full-width scan noop")(li.write.format("noop").mode("overwrite").save())
      val q1 = t("q1 sql")(spark.sql(
        """SELECT l_orderkey, l_linenumber,
          |       l_extendedprice * (1 - l_discount) AS revenue,
          |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
          |       l_returnflag || '/' || l_linestatus AS flag_status,
          |       lower(l_returnflag) AS rf_lower,
          |       substr(cast(l_shipdate AS STRING), 1, 7) AS ship_month,
          |       cast(year(l_shipdate) AS INT) AS ship_year
          |FROM lineitem""".stripMargin))
      t("q1 noop write")(q1.write.format("noop").mode("overwrite").save())
    }
    Runtime.getRuntime.halt(0)
  }
}
