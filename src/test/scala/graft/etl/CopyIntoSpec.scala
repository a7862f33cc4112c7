package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COPY INTO: idempotent batch file ingestion — "load whatever new
  * files landed in this directory, exactly once, re-runnable." The
  * ledger rides the manifest's `#txn` header facts keyed by qualified
  * source path, so re-runs skip loaded files and publish NO new
  * version when nothing new landed; a mutated already-loaded file
  * refuses unless COPY_OPTIONS('force'='true'); racing COPYs of the
  * same files publish exactly one.
  */
class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def land(src: String, sub: String, lo: Int, hi: Int): Unit = {
    import spark.implicits._
    (lo until hi).map(i => (s"g${i % 2}", i.toLong, s"p$i"))
      .toDF("grp", "x", "payload").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/$sub")
  }

  test("land → COPY → land → COPY → re-run no-op; rows exactly-once") {
    val src = Files.createTempDirectory("copy-src").toString
    val dir = freshDir("copy-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, x BIGINT, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    land(src, "batch1", 0, 30)
    val r1 = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET").head()
    assert(r1.getLong(1) === 1L && r1.getLong(2) === 30L, r1.toString)
    land(src, "batch2", 30, 50)
    val r2 = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET").head()
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 20L,
      s"second COPY loads only the new files: $r2")
    val vAfter = ManifestLake.currentVersion(spark, dir).get
    // the re-run is a NO-OP: zero files, zero rows, ZERO new versions
    val r3 = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET").head()
    assert(r3.getLong(0) === vAfter && r3.getLong(1) === 0L && r3.getLong(2) === 0L)
    assert(ManifestLake.currentVersion(spark, dir).get === vAfter,
      "a no-op COPY must not publish a version")
    assert(spark.sql(s"SELECT count(*), count(DISTINCT x) FROM $t").head()
      .toSeq === Seq(50L, 50L))
  }

  test("PATTERN scopes the load; later widening the pattern loads the rest") {
    val src = Files.createTempDirectory("copy-pat").toString
    val dir = freshDir("copy-pat-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, x BIGINT, payload STRING) " +
      "USING `graft-manifest`")
    land(src, "a/one", 0, 10)
    land(src, "b/two", 10, 25)
    val r1 = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET " +
      "PATTERN = 'a/**'").head()
    assert(r1.getLong(2) === 10L, r1.toString)
    val r2 = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET " +
      "PATTERN = '{a,b}/**'").head()
    assert(r2.getLong(2) === 15L, s"widened pattern loads only b: $r2")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 25L)
  }

  test("FORMAT_OPTIONS schema hint pins CSV types — no inference pass") {
    val src = Files.createTempDirectory("copy-hint").toString
    // leading-zero codes: inferSchema would type them INT and destroy
    // the zeros; the declared schema keeps them strings byte-for-byte
    Files.writeString(Paths.get(s"$src/codes.csv"),
      "code,x\n00123,1\n00007,2\n99,3\n")
    val dir = freshDir("copy-hint-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (code STRING, x BIGINT) USING `graft-manifest`")
    val r = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('schema' = 'code STRING, x BIGINT')").head()
    assert(r.getLong(1) === 1L && r.getLong(2) === 3L, r.toString)
    assert(spark.sql(s"SELECT code FROM $t ORDER BY x").collect()
      .map(_.getString(0)).toSeq === Seq("00123", "00007", "99"))
    // an unparseable DDL refuses loudly
    val bad = intercept[Exception](spark.sql(
      s"COPY INTO $t FROM '$src' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('schema' = 'not a ( schema')").collect())
    assert(bad.getMessage.contains("schema"), bad.getMessage)
    // parquet refuses the option: the footer IS the schema
    val pq = intercept[Exception](spark.sql(
      s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET " +
        "FORMAT_OPTIONS ('schema' = 'code STRING')").collect())
    assert(pq.getMessage.contains("parquet"), pq.getMessage)
  }

  test("VALIDATE dry-runs every check and commits nothing") {
    val src = Files.createTempDirectory("copy-val").toString
    val dir = freshDir("copy-val-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, x BIGINT, payload STRING) " +
      "USING `graft-manifest`")
    land(src, "b1", 0, 12)
    val v0 = ManifestLake.currentVersion(spark, dir).get
    // dry run: reports the would-load file count, moves nothing
    val dry = spark.sql(
      s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET VALIDATE").head()
    assert(dry.getLong(0) === v0 && dry.getLong(1) === 1L && dry.getLong(2) === 0L,
      dry.toString)
    assert(ManifestLake.currentVersion(spark, dir).get === v0,
      "VALIDATE must not publish a version")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 0L)
    // schema drift refuses under VALIDATE exactly as the real load would
    val driftSrc = Files.createTempDirectory("copy-val-drift").toString
    import spark.implicits._
    Seq((1L, "x", 2.0)).toDF("x", "grp", "extra_col").coalesce(1)
      .write.mode("overwrite").parquet(s"$driftSrc/d")
    val e = intercept[Exception](spark.sql(
      s"COPY INTO $t FROM '$driftSrc' FILEFORMAT = PARQUET VALIDATE").collect())
    assert(e.getMessage.contains("extra_col"), e.getMessage)
    // the real load after a clean VALIDATE ingests everything
    val real = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET").head()
    assert(real.getLong(1) === 1L && real.getLong(2) === 12L)
    // a VALIDATE after the load sees nothing new to do
    val dry2 = spark.sql(
      s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET VALIDATE").head()
    assert(dry2.getLong(1) === 0L)
  }

  test("CSV with FORMAT_OPTIONS; absent columns fill DEFAULTs; identity assigns") {
    val src = Files.createTempDirectory("copy-csv").toString
    Files.writeString(Paths.get(s"$src/one.csv"), "grp,x\na,1\nb,2\n")
    Files.writeString(Paths.get(s"$src/two.csv"), "grp,x\na,3\n")
    val dir = freshDir("copy-csv-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, x BIGINT, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "quality STRING DEFAULT 'unscored') USING `graft-manifest`")
    val r = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'true')").head()
    assert(r.getLong(1) === 2L && r.getLong(2) === 3L, r.toString)
    val rows = spark.sql(s"SELECT x, id, quality FROM $t ORDER BY x").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getLong(1)).distinct.length === 3,
      "identity must assign unique values to COPY'd rows")
    assert(rows.forall(_.getString(2) == "unscored"),
      "absent DEFAULTed columns must materialize their default")
  }

  test("refusals: schema drift, mutated file (then force), bad format, options") {
    val src = Files.createTempDirectory("copy-refuse").toString
    val dir = freshDir("copy-refuse-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, x BIGINT) USING `graft-manifest`")
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.toLowerCase.contains(needle.toLowerCase),
        s"for $sql got: ${msg.take(250)}")
    }
    // schema drift: a source column the table lacks refuses loudly
    import spark.implicits._
    Seq(("a", 1L, "extra")).toDF("grp", "x", "rogue").coalesce(1)
      .write.parquet(s"$src/drift")
    refuses(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET", "rogue")
    assert(ManifestLake.currentVersion(spark, dir).get === 1L,
      "a refused COPY must publish nothing")
    refuses(s"COPY INTO $t FROM '$src' FILEFORMAT = AVRO", "FILEFORMAT")
    refuses(s"COPY INTO $t FROM '${src}/nope' FILEFORMAT = PARQUET",
      "does not exist")
    refuses(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET " +
      "COPY_OPTIONS ('mergeSchema' = 'true')", "force")
    // mutated already-loaded file: same path, new content
    val src2 = Files.createTempDirectory("copy-mutate").toString
    Seq(("a", 1L)).toDF("grp", "x").coalesce(1).write.parquet(s"$src2/b1")
    val t2dir = freshDir("copy-mutate-tgt")
    val t2 = s"`graft-manifest`.`$t2dir`"
    spark.sql(s"CREATE TABLE $t2 (grp STRING, x BIGINT) USING `graft-manifest`")
    assert(spark.sql(s"COPY INTO $t2 FROM '$src2' FILEFORMAT = PARQUET")
      .head().getLong(2) === 1L)
    // replace the landed part file IN PLACE (same name, new bytes)
    val part = new java.io.File(s"$src2/b1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val other = Files.createTempDirectory("copy-other").toString
    Seq(("z", 7L), ("z", 8L)).toDF("grp", "x").coalesce(1)
      .write.parquet(s"$other/gen")
    val replacement = new java.io.File(s"$other/gen").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    Files.copy(replacement, part, StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar the in-place replace staled
    Files.deleteIfExists(part.resolveSibling(s".${part.getFileName}.crc"))
    refuses(s"COPY INTO $t2 FROM '$src2' FILEFORMAT = PARQUET", "force")
    val rf = spark.sql(s"COPY INTO $t2 FROM '$src2' FILEFORMAT = PARQUET " +
      "COPY_OPTIONS ('force' = 'true')").head()
    assert(rf.getLong(1) === 1L && rf.getLong(2) === 2L,
      s"force re-ingests the mutated file: $rf")
    assert(spark.sql(s"SELECT count(*) FROM $t2").head().getLong(0) === 3L,
      "force duplicates are the caller's explicit choice")
  }

  test("racing COPYs of the same files load exactly once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val src = Files.createTempDirectory("copy-race").toString
    land(src, "b1", 0, 40)
    val dir = freshDir("copy-race-tgt")
    spark.sql(s"CREATE TABLE `graft-manifest`.`$dir` (grp STRING, x BIGINT, " +
      "payload STRING) USING `graft-manifest` PARTITIONED BY (grp)")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val legs = Seq(1, 2).map(_ => Future {
      barrier.await()
      try Right(ManifestLake.copyInto(spark, dir, src, "parquet"))
      catch { case e: IllegalStateException => Left(e.getMessage) }
    })
    val results = Await.result(Future.sequence(legs), 300.seconds)
    val loaded = results.collect { case Right(r) => r.filesLoaded }.sum
    val conflicts = results.collect { case Left(m) => m }
    assert(loaded === 1L || (loaded === 2L &&
      results.collect { case Right(r) => r.filesLoaded }.contains(0L)),
      s"exactly one racer ingests: $results")
    conflicts.foreach(m => assert(m.contains("lost its race"), m))
    assert(ManifestLake.read(spark, dir).count() === 40L,
      "no double-load under the race")
    // and a follow-up COPY (the loser's re-run) is a clean no-op
    val again = ManifestLake.copyInto(spark, dir, src, "parquet")
    assert(again.filesLoaded === 0L && again.rowsLoaded === 0L)
  }

  test("the ledger survives unrelated commits and restore-from-head") {
    val src = Files.createTempDirectory("copy-carry").toString
    land(src, "b1", 0, 20)
    val dir = freshDir("copy-carry-tgt")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, x BIGINT, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET")
    spark.sql(s"DELETE FROM $t WHERE x % 2 = 0")
    val v = ManifestLake.currentVersion(spark, dir).get
    ManifestLake.restore(spark, dir, v - 1)
    val r = spark.sql(s"COPY INTO $t FROM '$src' FILEFORMAT = PARQUET").head()
    assert(r.getLong(1) === 0L,
      s"the copy ledger must carry through DELETE and RESTORE: $r")
  }
}
