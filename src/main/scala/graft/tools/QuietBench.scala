package graft.tools

/** Targeted quiet-host re-measurement of individual bench queries —
  * the tool for "did this query really regress, or did the shared VM
  * swing": runs the named queries with [[graft.Bench]]'s exact
  * methodology (noop-sink materialization, 1 warmup + N timed runs,
  * median) plus the same fixed CPU-bound calibration probe, and prints
  * per query the raw samples, the median, the host 1-minute load, and
  * the calibration-normalized median (median / calib) that the
  * round-over-round deltas compare.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.QuietBench q1 q2 …
  *        (optional leading -n<runs>, default 3 timed runs)
  */
object QuietBench {

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("-n"))
    val runs = flags.headOption.map(_.stripPrefix("-n").toInt).getOrElse(3)
    require(names.nonEmpty, "QuietBench: pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("quiet-bench")
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def calibrate(): Double = {
      def once() = timeIt(materialize(
        spark.range(2048L << 20).select(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("id") % 7).as("s"))))
      once()
      median((0 until 3).map(_ => once()))
    }
    def load1(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")))
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    val calib = calibrate()
    println(f"STAGE quiet: calibration=$calib%.3f load1=${load1()}%.2f sf=$sfDir")
    names.foreach { n =>
      val q = graft.queries.Registry.all.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"QuietBench: unknown query $n"))
      timeIt(materialize(q.run(spark, sfDir))) // warmup: plan + JIT + cache
      val ts = (0 until runs).map(_ => timeIt(materialize(q.run(spark, sfDir))))
      val med = median(ts)
      println(f"STAGE quiet: $n median=$med%.3f normalized=${med / calib}%.3f " +
        f"load1=${load1()}%.2f samples=[${ts.map(t => f"$t%.3f").mkString(",")}]")
    }
    spark.stop()
    Runtime.getRuntime.halt(0)
  }
}
