package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch: phase timing for the PageRank loop shapes. */
object PrProbe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[pr] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("pr-probe")
    val tt = Tables(spark, sfDir)
    val li = tt.lineitem.select("l_orderkey", "l_suppkey")
    val o = tt.orders.select("o_orderkey", "o_custkey")
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

    val sc = spark.sparkContext
    val parts = sc.defaultParallelism
    val part = new org.apache.spark.HashPartitioner(parts)

    val fwd = t("edges->rdd") {
      val r = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(x => (x.getLong(0), x.getLong(1)))
      System.err.println(s"[pr] edges=${r.count()}")
      r
    }
    val sym = t("sym distinct") {
      val s = fwd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }.distinct(parts)
      System.err.println(s"[pr] sym=${s.count()}")
      s
    }
    val deg = t("deg") {
      val d = sym.mapValues(_ => 1L).reduceByKey(part, _ + _)
      System.err.println(s"[pr] nodes=${d.count()}")
      d
    }
    val es = t("es build+persist") {
      val e = sym.partitionBy(part).join(deg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      System.err.println(s"[pr] es=${e.count()}")
      e
    }
    val n = deg.count()
    val base = (1.0 - 0.85) / n
    var ranks = deg.mapValues(_ => 1.0 / n)
    t("r0 count")(ranks.count())
    t("x1 es.count cached")(es.count())
    t("x2 es iterate")(es.map(_._1).count())
    t("x3 es.join(r0)")(es.join(ranks).count())
    val c0 = es.join(ranks).map { case (_, ((d2, dg), r)) => (d2, r / dg) }
    t("x4 contribs")(c0.count())
    t("x5 contribs+reduce")(c0.reduceByKey(part, _ + _).count())
    val rmap = sc.broadcast(ranks.collectAsMap())
    val cb = es.mapPartitions(p2 => p2.flatMap { case (s2, (d2, dg)) =>
      rmap.value.get(s2) match { case Some(r) => Iterator.single((d2, r / dg)); case None => Iterator.empty } })
    t("x6 bcast contribs")(cb.count())
    t("x7 bcast contribs+reduce")(cb.reduceByKey(part, _ + _).count())
    (1 to 3).foreach { i =>
      val next = es.join(ranks).map { case (_, ((d2, dg), r)) => (d2, r / dg) }
        .reduceByKey(part, _ + _)
        .mapValues(s => base + 0.85 * s)
      t(s"iter $i")(next.count())
      ranks = next
    }
    Runtime.getRuntime.halt(0)
  }
}
