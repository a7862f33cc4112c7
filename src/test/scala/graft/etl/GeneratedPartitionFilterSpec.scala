package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generated-partition-column filter INFERENCE: a table partitioned by
  * a GENERATED column queried by the BASE column must prune to exactly
  * the derivable partitions — the Delta OptimizeGeneratedColumn idiom.
  * Verified by the executed scan's numFiles metric (plan-shape ground
  * truth, not row counts), with a correctness leg on every pruned
  * query and the sound-skip cases (range filters, null-deriving
  * literals, multi-base expressions) left unpruned.
  */
class GeneratedPartitionFilterSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/table"

  private def filesRead(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val n = df.collect().length.toLong
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    (n, scan.metrics("numFiles").value)
  }

  test("equality and IN filters on the base column prune generated partitions") {
    import spark.implicits._
    val dir = freshDir("genpart")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (id BIGINT, payload STRING,
         |  bkt STRING GENERATED ALWAYS AS (CAST(id % 4 AS STRING)))
         |USING `graft-manifest` PARTITIONED BY (bkt)""".stripMargin)
    (0 until 80).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .createOrReplaceTempView("genpart_src")
    spark.sql(s"INSERT INTO $t (id, payload) SELECT * FROM genpart_src")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val total = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get).files.length.toLong
    assert(total >= 4, s"need one file per partition at least, got $total")
    val perPart = total / 4
    // equality on the BASE column prunes to ONE partition
    val (n1, f1) = filesRead(
      spark.sql(s"SELECT id, payload FROM $t WHERE id = 42"))
    assert(n1 === 1L)
    assert(f1 <= perPart,
      s"id = 42 must prune to partition bkt=2's files ($f1 of $total read)")
    // literal-first spelling prunes the same way
    val (n1b, f1b) = filesRead(
      spark.sql(s"SELECT id FROM $t WHERE 42 = id"))
    assert(n1b === 1L && f1b <= perPart)
    // IN-list prunes to the union of derived partitions (42%4=2, 43%4=3)
    val (n2, f2) = filesRead(
      spark.sql(s"SELECT id FROM $t WHERE id IN (42, 43)"))
    assert(n2 === 2L)
    assert(f2 <= 2 * perPart, s"IN must prune to two partitions ($f2/$total)")
    // a RANGE filter cannot derive a partition value — sound no-prune
    // (every partition read; correctness intact)
    val (n3, f3) = filesRead(
      spark.sql(s"SELECT id FROM $t WHERE id > 77"))
    assert(n3 === 2L && f3 === total,
      s"range filters must not infer (got $f3 of $total)")
    // combined predicates keep working: base equality AND a data filter
    val (n4, f4) = filesRead(spark.sql(
      s"SELECT id FROM $t WHERE id = 42 AND payload = 'p42'"))
    assert(n4 === 1L && f4 <= perPart)
    // correctness at the partition boundary: every row accounted for
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 80L)
  }

  test("sound skips: multi-base expressions and filters on other columns never prune") {
    import spark.implicits._
    val dir = freshDir("genpart-skip")
    val t = s"`graft-manifest`.`$dir`"
    // two-base generated partition column: inference must stay OFF
    spark.sql(
      s"""CREATE TABLE $t (a BIGINT, b BIGINT,
         |  bkt STRING GENERATED ALWAYS AS (CAST((a + b) % 2 AS STRING)))
         |USING `graft-manifest` PARTITIONED BY (bkt)""".stripMargin)
    val rows = (0 until 40).map(i => (i.toLong, (i % 3).toLong))
    rows.toDF("a", "b").createOrReplaceTempView("genpart_skip_src")
    spark.sql(s"INSERT INTO $t (a, b) SELECT * FROM genpart_skip_src")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val total = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get).files.length.toLong
    val (n, f) = filesRead(spark.sql(s"SELECT a FROM $t WHERE a = 7"))
    assert(n === 1L && f === total,
      s"a multi-base generated expression must not infer ($f of $total)")
    // explicit partition predicates still prune as before
    val expect0 = rows.count { case (a, b) => (a + b) % 2 == 0 }.toLong
    val (np, fp) = filesRead(
      spark.sql(s"SELECT a FROM $t WHERE bkt = '0'"))
    assert(np === expect0 && fp < total)
  }
}
