package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning THROUGH `graft-manifest` scans — the plan
  * shape that decides whether a fact-dim join on a 100 TB manifested
  * table re-reads the world or only the dim's surviving partitions.
  *
  * Spark's DPP inserts a runtime `dynamicpruning` filter on the fact
  * scan's partition column (reusing the dim's broadcast), and
  * `FileSourceScanExec` applies it to whatever `PartitionDirectory`s
  * the relation's [[org.apache.spark.sql.execution.datasources.FileIndex]]
  * produced — so it must compose with [[ManifestFileIndex]] with no
  * extra hook. These tests PROVE that: the runtime filter appears in
  * the plan, and the scan's own numPartitions/numFiles metrics show
  * strictly fewer partitions read than the table holds.
  */
class DynamicPruningSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  /** Every FileSourceScanExec in the executed plan whose location is
    * the manifest index (subqueries included — DPP's filter lives in
    * one).
    */
  private def manifestScans(plan: SparkPlan): Seq[FileSourceScanExec] = {
    val here = plan match {
      case s: FileSourceScanExec
        if s.relation.location.isInstanceOf[ManifestFileIndex] => Seq(s)
      case _ => Seq.empty
    }
    here ++ (plan.children ++ plan.subqueries).flatMap(manifestScans)
  }

  test("DPP prunes manifest partitions via the dim's broadcast: strictly fewer partitions and files scanned") {
    import spark.implicits._
    val dir = freshDir("mlake-dpp")
    val fact = (0 until 200).map(i => (s"g${i % 10}", i.toLong, s"p$i"))
      .toDF("grp", "x", "payload")
    ManifestLake.write(spark, fact, dir, Seq("grp"))
    // three traps this setup dodges, each of which silently voids the
    // proof: (a) a local-Seq dim constant-folds into a LocalRelation —
    // no Filter node, so Spark's "selective filter" heuristic never
    // fires (use a real parquet source); (b) `flag === true` simplifies
    // to a bare attribute, which the heuristic ignores (use a
    // comparison); (c) a filter on the JOIN KEY propagates to the fact
    // side as a STATIC constraint — the partitions prune without DPP
    // and the test proves nothing (filter a non-key column)
    val dimDir = freshDir("dpp-dim")
    (0 until 10).map(i => (s"g$i", i)).toDF("grp", "weight")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def run(): (Long, FileSourceScanExec, String) = {
        val joined = ManifestLake.read(spark, dir)
          .join(broadcast(dim.where(col("weight") < 2)), "grp")
        // collect() (not count()) so the metrics land on THIS plan object
        val n = joined.collect().length.toLong
        val plan = joined.queryExecution.executedPlan
        val scans = manifestScans(plan)
        assert(scans.length === 1, s"expected one manifest scan:\n$plan")
        (n, scans.head, plan.toString)
      }
      val (n, scan, planStr) = run()
      assert(n === 40L)
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"no runtime pruning filter on the manifest scan:\n$planStr")
      assert(scan.metrics("numPartitions").value === 2,
        "the scan must read only the dim's surviving partitions")
      val (fs, root) = ManifestLake.fsFor(spark, dir)
      val live = ManifestLake.readManifest(fs, root, 1L).files
      val dynFiles = live.count(f =>
        f.path.contains("/grp=g0/") || f.path.contains("/grp=g1/"))
      assert(scan.metrics("numFiles").value === dynFiles,
        "the scan must open exactly the surviving partitions' files")
      assert(dynFiles < live.length,
        "sanity: pruning must have had something to drop")

      // control: with DPP off the same join reads every partition —
      // proving the assertion above measures pruning, not layout
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try {
        val (n2, scan2, _) = run()
        assert(n2 === 40L)
        assert(scan2.metrics("numPartitions").value === 10,
          "control run (DPP off) must scan all partitions")
      } finally
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("DPP composes with static partition filters and manifest stats skipping on the same scan") {
    import spark.implicits._
    val dir = freshDir("mlake-dpp-static")
    val fact = (0 until 400).map(i => (s"g${i % 10}", i.toLong, s"p$i"))
      .toDF("grp", "x", "payload")
    // range-cluster x within files so the stats leg has something to skip
    ManifestLake.write(spark,
      fact.repartitionByRange(8, col("x")), dir, Seq("grp"), statsCols = Seq("x"))
    val dimDir = freshDir("dpp-dim2")
    (0 until 10).map(i => (s"g$i", i)).toDF("grp", "weight")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // static filter keeps g0..g4; dim keeps evens {g0,g2,g4,g6,g8};
      // runtime intersection = {g0,g2,g4}
      val joined = ManifestLake.read(spark, dir)
        .where(col("grp") < "g5" && col("x") < 100L)
        .join(broadcast(dim.where(col("weight") % 2 === 0)), "grp")
      val n = joined.count()
      val scans = manifestScans(joined.queryExecution.executedPlan)
      assert(scans.length === 1)
      assert(n === joined.collect().length.toLong)
      assert(scans.head.metrics("numPartitions").value === 3,
        "static ∩ dynamic partition pruning must both apply")
      // the x < 100 data filter must also have skipped whole files via
      // manifest [min,max] — with 8 range buckets over 0..399, files
      // holding only x >= 100 never enter the scan
      val allFiles = ManifestLake.read(spark, dir)
        .where(col("grp") < "g5").inputFiles.length
      assert(scans.head.metrics("numFiles").value < allFiles,
        "manifest stats skipping must still drop files under DPP")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
