package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: the property under test is the one that drives
  * row-group skipping — per-file min/max spans must be narrow on BOTH
  * z-columns, where a single-column sort leaves the other column's
  * span at full width. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("zvalue2 interleaves bits (known values)") {
    import spark.implicits._
    val r = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.zvalue2(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(a=3=0b011, b=5=0b101) = b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 0b100111
    assert(r == Seq(0L, 1L, 2L, 39L))
  }

  test("zvalueN: 2-col form == zvalue2; 3-col interleave is a bijection") {
    import spark.implicits._
    // consistency with the 2-D primitive on random-ish values
    val two = (0L until 200L).map(i => (i * 7 % 256, i * 13 % 256)).toDF("a", "b")
      .select(Layout.zvalue2(col("a"), col("b"), 8).as("z2"),
        Layout.zvalueN(Seq(col("a"), col("b")), 8).as("zn"))
      .filter(col("z2") =!= col("zn")).count()
    assert(two == 0, "zvalueN(2 cols) diverged from zvalue2")
    // 3-D bijectivity over the full 8x8x8 grid (bits=3): every cell maps
    // to a distinct index in [0, 512)
    val grid = (for { a <- 0 until 8; b <- 0 until 8; c <- 0 until 8 }
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
      .select(Layout.zvalueN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(grid.distinct.length == 512 && grid.min == 0L && grid.max == 511L)
  }

  test("hilbert2 walks every cell exactly once with unit steps (adjacency invariant)") {
    import spark.implicits._
    // full 16x16 grid through the Column expression; the curve must be a
    // bijection onto 0..255 AND every consecutive index pair must be
    // Manhattan-distance-1 apart — the locality property Morton lacks
    // (zvalue2 jumps e.g. from (1,0)->(0,1) are fine but (3,1)->(0,2)
    // crosses the space)
    val cells = spark.range(256)
      .select((col("id") % 16).as("a"), (col("id") / 16).cast("long").as("b"))
      .select(col("a"), col("b"), Layout.hilbert2(col("a"), col("b"), 4).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L until 256L).toSeq, "not a bijection onto 0..255")
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (h2, (x2, y2))) =>
      val dist = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(dist == 1, s"curve jump at index $h2: ($x1,$y1)->($x2,$y2)")
    }
    // contrast: Morton provably violates adjacency (the 2x2-block seam)
    val mort = spark.range(256)
      .select((col("id") % 16).as("a"), (col("id") / 16).cast("long").as("b"))
      .select(col("a"), col("b"), Layout.zvalue2(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    val mortonJumps = mort.sliding(2).count { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "expected Morton to have non-adjacent steps")
  }

  test("hilbert2 is SQL-callable through GraftExtensions (bits literal, int coercion)") {
    val got = spark.sql(
      "SELECT hilbert2(a, b, 4) AS h FROM VALUES (3, 5), (0, 0) AS t(a, b)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(
      graft.functions.Hilbert2.index(3, 5, 4),
      graft.functions.Hilbert2.index(0, 0, 4)))
  }

  test("z-order layout narrows per-file stat spans on both dimensions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val n = 100000
    // two independent uniform dims, 0..1023
    val df = spark.range(n.toLong).select(
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"),
      col("id"))

    Layout.writeZOrdered(df, s"$dir/z", col("x"), col("y"), nFiles = 16, bits = 10)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/x")

    def spans(path: String): (Double, Double) = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).collect().head
      (per.getDouble(0), per.getDouble(1))
    }
    val (zx, zy) = spans(s"$dir/z")
    val (zx1, zy1) = spans(s"$dir/x")
    // single-column layout: x clustered, y full-width (~1023)
    assert(zx1 < 100 && zy1 > 900, s"x-sort layout: x span $zx1, y span $zy1")
    // z-order: BOTH dims' spans well under full width — each file is a box
    assert(zx < 600 && zy < 600, s"z-order spans not narrowed: x $zx, y $zy")

    // layout does not change query results
    val box = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("x").between(100, 150) && col("y").between(200, 250))
        .agg(count(lit(1))).collect().head.getLong(0)
    assert(box(spark.read.parquet(s"$dir/z")) == box(df))
  }

  test("statsIndex + readPruned: box query touches only intersecting files, same answer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-statsidx").toString
    try {
      val df = spark.range(100000).select(
        pmod(xxhash64(col("id")), lit(1024L)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"),
        col("id"))
      Layout.writeZOrdered(df, s"$dir/z", col("x"), col("y"), nFiles = 16, bits = 10)
      val idx = Layout.statsIndex(spark, s"$dir/z", Seq("x", "y"))
      assert(idx.count() == 16)
      val bounds = Map("x" -> (100L, 150L), "y" -> (200L, 250L))
      val pruned = Layout.readPruned(spark, idx, bounds)
      // the z-ordered layout makes most files non-intersecting: the
      // pruned read must open strictly fewer than all 16
      val opened = pruned.select(input_file_name()).distinct().count()
      assert(opened < 16, s"index pruned nothing: opened $opened files")
      // and the box answer is identical to the full scan's
      def box(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("x").between(100, 150) && col("y").between(200, 250))
          .agg(count(lit(1))).collect().head.getLong(0)
      assert(box(pruned) == box(df))
      // a box outside the domain prunes every file and returns empty
      assert(Layout.readPruned(spark, idx, Map("x" -> (5000L, 6000L))).count() == 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("statsIndexUpdate: incremental == full rebuild; scans ONLY the new files; drops deleted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-statsupd").toString
    try {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("file").as[(String, Long, Long, Long)].collect().toSeq
      // the index is a PERSISTED manifest (the scaladoc contract) — a
      // lazy plan over the data files would re-scan them on every use,
      // including files deleted since; round-trip through parquet like
      // production would
      var gen = 0
      def persisted(df: org.apache.spark.sql.DataFrame) = {
        gen += 1
        df.write.mode("overwrite").parquet(s"$dir/idx$gen")
        spark.read.parquet(s"$dir/idx$gen")
      }
      spark.range(0, 5000).select(col("id").as("x"))
        .repartition(4).write.parquet(s"$dir/t")
      val idx0 = persisted(Layout.statsIndex(spark, s"$dir/t", Seq("x")))
      // append-only ingest drops three more files in
      spark.range(5000, 9000).select(col("id").as("x"))
        .repartition(3).write.mode("append").parquet(s"$dir/t")
      val updated = persisted(Layout.statsIndexUpdate(spark, s"$dir/t", Seq("x"), idx0))
      val rebuilt = Layout.statsIndex(spark, s"$dir/t", Seq("x"))
      assert(canon(updated) == canon(rebuilt),
        "incremental stats index diverged from full rebuild")
      assert(updated.count() == 7)
      // no new files -> the same index comes back unchanged
      assert(canon(Layout.statsIndexUpdate(spark, s"$dir/t", Seq("x"), updated)) ==
        canon(updated))
      // a file removed by compaction disappears from the refreshed index
      val victim = new java.io.File(s"$dir/t").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      assert(victim.delete())
      val afterDelete = persisted(
        Layout.statsIndexUpdate(spark, s"$dir/t", Seq("x"), updated))
      assert(afterDelete.count() == 6)
      assert(canon(afterDelete) == canon(Layout.statsIndex(spark, s"$dir/t", Seq("x"))))
      // hive-partitioned layout: files live in key=value subdirectories —
      // the recursive walk must see them (a top-level listing would
      // classify every indexed file as deleted and empty the index)
      spark.range(0, 1000).select((col("id") % 2).cast("string").as("p"), col("id").as("x"))
        .repartition(2).write.partitionBy("p").parquet(s"$dir/pt")
      val pIdx = persisted(Layout.statsIndex(spark, s"$dir/pt", Seq("x")))
      spark.range(1000, 1500).select(lit("0").as("p"), col("id").as("x"))
        .coalesce(1).write.mode("append").partitionBy("p").parquet(s"$dir/pt")
      val pUpd = Layout.statsIndexUpdate(spark, s"$dir/pt", Seq("x"), pIdx)
      assert(canon(pUpd) == canon(Layout.statsIndex(spark, s"$dir/pt", Seq("x"))),
        "partitioned incremental stats index diverged from rebuild")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("fingerprint index: point lookups skip files min/max can't prune; refresh stays compatible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fpidx").toString
    try {
      // high-cardinality key HASH-scattered across files: every file
      // spans the whole value range, so min/max pruning keeps all of
      // them — the membership fingerprint is what makes the point
      // lookup skip. Hash-clustering puts each key's rows in ONE file.
      spark.range(40000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(8, col("uid")).write.parquet(s"$dir/t")
      Layout.statsIndexFingerprint(spark, s"$dir/t", Seq("uid"), Seq("uid"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      val idx = spark.read.parquet(s"$dir/idx")
      assert(idx.count() == 8)
      // NO FALSE NEGATIVES: every present probe's rows survive pruning
      val probes = spark.read.parquet(s"$dir/t")
        .limit(20).select("uid").as[Long].collect()
      probes.foreach { v =>
        val pruned = Layout.readPrunedEquals(spark, idx, Map("uid" -> v))
        assert(pruned.filter(col("uid") === v).count() == 1,
          s"false negative for $v")
        // each key lives in one file; false positives may add a couple
        assert(pruned.inputFiles.length <= 3,
          s"pruned read opened ${pruned.inputFiles.length} of 8 files for $v")
      }
      // an ABSENT value prunes everything (deterministic hash, no flake)
      assert(Layout.readPrunedEquals(spark, idx,
        Map("uid" -> 0x0123456789ABCDEFL)).count() == 0)
      // incremental refresh rebuilds the SAME fingerprints for fresh
      // files (parameters read from the index itself)
      spark.range(40000, 50000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(2, col("uid")).write.mode("append").parquet(s"$dir/t")
      val upd = Layout.statsIndexUpdate(spark, s"$dir/t", Seq("uid"), idx)
      // Row.toString prints byte arrays by identity — render content
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("file").collect().map(_.toSeq.map {
          case b: Array[Byte] => java.util.Arrays.hashCode(b).toString
          case x => String.valueOf(x)
        }.mkString("|")).toSeq
      assert(canon(upd) ==
        canon(Layout.statsIndexFingerprint(spark, s"$dir/t", Seq("uid"), Seq("uid"))),
        "incremental fingerprint refresh diverged from full rebuild")
      // a value born after the first build is findable through the
      // refreshed index
      val young = spark.read.parquet(s"$dir/t")
        .filter(col("g") === 7).limit(1).select("uid").as[Long].collect().head
      upd.write.mode("overwrite").parquet(s"$dir/idx2")
      val pruned2 = Layout.readPrunedEquals(spark,
        spark.read.parquet(s"$dir/idx2"), Map("uid" -> young))
      assert(pruned2.filter(col("uid") === young).count() >= 1)
      // IN-list pruning: union of point probes, one index pass — every
      // probed key's rows survive, absent keys add nothing
      val inPruned = Layout.readPrunedIn(spark, idx, "uid",
        probes.take(5).toSeq :+ 0x0123456789ABCDEFL)
      probes.take(5).foreach { v =>
        assert(inPruned.filter(col("uid") === v).count() == 1,
          s"IN-probe false negative for $v")
      }
      assert(inPruned.inputFiles.length <= 6,
        s"IN-probe opened ${inPruned.inputFiles.length} of 8 files")
      // probing a non-fingerprinted column fails loudly
      intercept[IllegalArgumentException] {
        Layout.readPrunedEquals(spark, idx, Map("g" -> 5L))
      }
      intercept[IllegalArgumentException] {
        Layout.readPrunedIn(spark, idx, "g", Seq(5L))
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("targetedDelete: same-session read works, rewrite is targeted, re-run is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tdel").toString
    try {
      // hash-clustered high-cardinality key, 8 files — the fingerprint
      // names the few files holding the doomed keys
      spark.range(40000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(8, col("uid")).write.parquet(s"$dir/t")
      val idx = Layout.statsIndexFingerprint(spark, s"$dir/t", Seq("uid"), Seq("uid"))
      val doomed = spark.read.parquet(s"$dir/t")
        .limit(3).select("uid").as[Long].collect().toSeq
      val before = spark.read.parquet(s"$dir/t").inputFiles.toSet
      val expectSurvivors = spark.read.parquet(s"$dir/t")
        .filter(!col("uid").isin(doomed: _*)).count()
      val idx2 = Layout.targetedDelete(spark, s"$dir/t", idx, "uid", doomed,
        Seq("uid"))
      // THE round-8 failure shape: a plain read of the directory in the
      // SAME session, immediately after the delete, with no caller-side
      // refresh — the stale FileStatusCache used to kill this with
      // FAILED_READ_FILE.FILE_NOT_EXIST
      val after = spark.read.parquet(s"$dir/t")
      assert(after.count() == expectSurvivors)
      assert(after.filter(col("uid").isin(doomed: _*)).count() == 0,
        "deleted keys still present")
      // targeted: most files byte-identical
      val afterFiles = after.inputFiles.toSet
      assert((before intersect afterFiles).size >= 4,
        s"rewrite not targeted: ${(before intersect afterFiles).size} of 8 untouched")
      // refreshed index covers exactly the directory's current files
      assert(idx2.count() == afterFiles.size)
      // re-running the same delete on the refreshed index is the
      // documented no-op: rewritten files no longer fingerprint-match
      val idx3 = Layout.targetedDelete(spark, s"$dir/t", idx2, "uid", doomed,
        Seq("uid"))
      assert(spark.read.parquet(s"$dir/t").inputFiles.toSet == afterFiles,
        "re-run touched files")
      assert(idx3.count() == idx2.count())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("targetedDeleteInPlace: every path survives byte-addressably, " +
      "doomed rows gone, survivors intact; re-run is a 0-rewrite no-op; " +
      "the untouched index stays sound") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tdip").toString
    try {
      spark.range(40000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(8, col("uid")).write.parquet(s"$dir/t")
      val idx = Layout.statsIndexFingerprint(spark, s"$dir/t",
        Seq("uid"), Seq("uid"))
      idx.write.mode("overwrite").parquet(s"$dir/idx")
      val doomed = spark.read.parquet(s"$dir/t")
        .limit(3).select("uid").as[Long].collect().toSeq
      val before = spark.read.parquet(s"$dir/t").inputFiles.toSet
      val expectSurvivors = spark.read.parquet(s"$dir/t")
        .filter(!col("uid").isin(doomed: _*)).count()
      val n = Layout.targetedDeleteInPlace(spark, s"$dir/t",
        spark.read.parquet(s"$dir/idx"), "uid", doomed).length
      assert(n >= 1 && n <= 3, s"expected a targeted rewrite, got $n files")
      // THE contract: the file listing is IDENTICAL — nothing vanished,
      // nothing appeared (watching file sources see nothing new)
      val after = spark.read.parquet(s"$dir/t")
      assert(after.inputFiles.toSet == before,
        "in-place rewrite changed the path set")
      assert(after.count() == expectSurvivors)
      assert(after.filter(col("uid").isin(doomed: _*)).count() == 0,
        "deleted keys still present")
      // the UNTOUCHED index stays sound: stale fingerprints only
      // over-approximate, so a probe for a surviving key still finds it
      val probe = spark.read.parquet(s"$dir/t").limit(1)
        .select("uid").as[Long].head()
      assert(Layout.readPrunedEquals(spark,
        spark.read.parquet(s"$dir/idx"), Map("uid" -> probe))
        .filter(col("uid") === probe).count() >= 1)
      // re-run: fingerprints still flag the rewritten files (stale,
      // sound) but the per-file probe finds no doomed rows — 0 rewrites
      assert(Layout.targetedDeleteInPlace(spark, s"$dir/t",
        spark.read.parquet(s"$dir/idx"), "uid", doomed).isEmpty,
        "re-run must rewrite nothing")
      assert(spark.read.parquet(s"$dir/t").count() == expectSurvivors)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("targetedDeleteInPlace heals a crashed swap BEFORE pinning the " +
      "caller's index: a lazily-built index whose plan scans the torn " +
      "corpus recovers instead of failing on the missing file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tdip-heal")
      .toString
    try {
      spark.range(10000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(4, col("uid")).write.parquet(s"$dir/t")
      val doomed = spark.read.parquet(s"$dir/t")
        .limit(2).select("uid").as[Long].collect().toSeq
      val expectSurvivors = spark.read.parquet(s"$dir/t")
        .filter(!col("uid").isin(doomed: _*)).count()
      // LAZY index built over the INTACT corpus — its plan captured the
      // full file listing, including the file about to go missing
      val lazyIdx = Layout.statsIndexFingerprint(spark, s"$dir/t",
        Seq("uid"), Seq("uid"))
      // simulate a crash between the two renames: a data file set aside
      // as the dot-file, its target path missing
      val f = new java.io.File(s"$dir/t").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val aside = new java.io.File(f.getParent, s".${f.getName}.graftold")
      assert(f.renameTo(aside))
      // round-13 order pinned the index first and died FILE_NOT_EXIST,
      // making the state unrecoverable by re-running; the heal-first
      // order restores the path and the delete completes
      val n = Layout.targetedDeleteInPlace(spark, s"$dir/t", lazyIdx,
        "uid", doomed).length
      assert(n >= 1, "delete did not rewrite anything after the heal")
      assert(!aside.exists() && f.exists(),
        "crashed swap not healed (aside still present or target missing)")
      val after = spark.read.parquet(s"$dir/t")
      assert(after.count() == expectSurvivors)
      assert(after.filter(col("uid").isin(doomed: _*)).isEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("bucketed tables join without any shuffle") {
    val li = graft.sources.Tables(spark, TestSession.sf0001).lineitem
      .select("l_orderkey", "l_quantity")
    val ord = graft.sources.Tables(spark, TestSession.sf0001).orders
      .select("o_orderkey", "o_totalprice")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
      Layout.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same rows as the shuffled join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("compact merges a many-small-files directory, content-preserving") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$dir/in"; val out = s"$dir/out"
    // 64 tiny files, like a streaming sink's per-trigger litter
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartition(64).write.parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 64)
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = inBytes / 4 // expect ceil(inputBytes/target) ≈ 4-5 files
    val n = graft.ops.Layout.compact(spark, in, out, target)
    assert(parquetFiles(out) == n && n <= 5)
    // pure rewrite: exact same multiset of rows
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
