package graft

import java.nio.file.Files

import graft.sources.{Tables => T, ZOrder}
import org.apache.spark.sql.functions._

/** Z-order layout (sink_zorder): correctness of sidecar-pruned range scans
  * on BOTH dimensions, and the layout claim itself — a z-ordered table
  * skips files on the second dimension where a 1-D sort cannot. */
class ZOrderSpec extends SparkSpec {

  private val NFiles = 16

  private lazy val (zPath, sPath, li) = {
    val d = Files.createTempDirectory("zorder").toString
    val df = T.lineitem(spark, TinyDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    ZOrder.writeZOrdered(df, s"$d/z", "l_partkey", "l_suppkey", NFiles)
    ZOrder.writeSortedBy(df, s"$d/s", "l_partkey", "l_suppkey", NFiles)
    (s"$d/z", s"$d/s", df)
  }

  private def bounds(c: String): (Double, Double) = {
    val r = li.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("pruned range scans return exactly the full-scan rows, both dims, both layouts") {
    val (plo, phi) = bounds("l_partkey")
    val loP = plo + (phi - plo) * 0.3; val hiP = plo + (phi - plo) * 0.4
    val (slo, shi) = bounds("l_suppkey")
    val loS = slo + (shi - slo) * 0.3; val hiS = slo + (shi - slo) * 0.4
    val expectP = li.filter(col("l_partkey").cast("double").between(loP, hiP)).count()
    val expectS = li.filter(col("l_suppkey").cast("double").between(loS, hiS)).count()
    for (path <- Seq(zPath, sPath)) {
      val (dfA, _) = ZOrder.rangeLookup(spark, path, "l_partkey", 0, loP, hiP)
      assert(dfA.count() == expectP, s"$path dimA")
      val (dfB, _) = ZOrder.rangeLookup(spark, path, "l_suppkey", 1, loS, hiS)
      assert(dfB.count() == expectS, s"$path dimB")
    }
    assert(expectP > 0 && expectS > 0)
  }

  test("z-order skips files on the second dimension; 1-D sort cannot") {
    val (slo, shi) = bounds("l_suppkey")
    // a narrow band on the NON-sort dimension
    val lo = slo + (shi - slo) * 0.45; val hi = slo + (shi - slo) * 0.55
    val (_, zFiles) = ZOrder.rangeLookup(spark, zPath, "l_suppkey", 1, lo, hi)
    val (_, sFiles) = ZOrder.rangeLookup(spark, sPath, "l_suppkey", 1, lo, hi)
    // the 1-D layout has suppkey spread across every file; z-order confines
    // it to the files whose suppkey rectangle overlaps the band
    assert(sFiles.size >= NFiles - 1, s"sorted layout unexpectedly tight: ${sFiles.size}")
    assert(zFiles.size < sFiles.size,
      s"z-order should touch fewer files: z=${zFiles.size} s=${sFiles.size}")
    assert(zFiles.size <= NFiles / 2,
      s"z-order should confine a 10% band to <= half the files, got ${zFiles.size}")
  }

  test("z-order stays useful on the first dimension (bounded blowup vs 1-D sort)") {
    val (plo, phi) = bounds("l_partkey")
    val lo = plo + (phi - plo) * 0.45; val hi = plo + (phi - plo) * 0.55
    val (_, zFiles) = ZOrder.rangeLookup(spark, zPath, "l_partkey", 0, lo, hi)
    // both dimensions pay ~sqrt resolution: a 10% band must not touch
    // everything
    assert(zFiles.size <= NFiles * 3 / 4,
      s"z-order first-dim scan touched ${zFiles.size}/$NFiles files")
  }
}
