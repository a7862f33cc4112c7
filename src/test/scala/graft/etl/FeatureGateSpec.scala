package graft.etl

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Reader feature gating: a manifest carrying `#requires <feature>`
  * this reader does not implement must refuse TYPED on every read path
  * (batch scan, SQL, streaming source, and writers reading the head) —
  * silently ignoring a visibility-bearing fact would serve wrong rows
  * with no error anywhere. Advisory unknown directives stay ignorable
  * (the forward-compatibility contract), and known features read
  * clean. Deletion vectors auto-stamp the fact and it carries forward
  * sticky across commits and clones.
  */
class FeatureGateSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def rawManifest(dir: String, v: Long): String = {
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val p = new Path(new Path(root, "_manifest"), f"v$v%06d.list.gz")
    val in = new java.util.zip.GZIPInputStream(fs.open(p))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Publish version v+1 as a verbatim copy of v's manifest plus extra
    * header directives — the shape a FUTURE writer (or a foreign tool)
    * would leave for today's reader to confront.
    */
  private def publishWithDirectives(dir: String, extra: Seq[String]): Long = {
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val v = ManifestLake.currentVersion(spark, dir).get
    val body = rawManifest(dir, v)
    val (dirs, files) = body.linesIterator.toSeq.partition(_.startsWith("#"))
    val out = new java.util.zip.GZIPOutputStream(fs.create(
      new Path(new Path(root, "_manifest"), f"v${v + 1}%06d.list.gz"), false))
    try out.write((dirs ++ extra ++ files).mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    v + 1
  }

  private def mkTable(tag: String): String = {
    import spark.implicits._
    val dir = freshDir(tag)
    ManifestLake.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir, Seq.empty)
    dir
  }

  test("an unknown required feature refuses typed on batch, SQL, and streaming reads") {
    val dir = mkTable("fgate")
    publishWithDirectives(dir, Seq("#requires\tfuture-row-encryption"))
    // batch scan
    val eBatch = intercept[UnsupportedTableFeatureException] {
      spark.read.format("graft-manifest").load(dir).collect()
    }
    assert(eBatch.features === Seq("future-row-encryption"))
    assert(eBatch.getMessage.contains("future-row-encryption") &&
      eBatch.getMessage.contains("upgrade"))
    // SQL path
    intercept[UnsupportedTableFeatureException] {
      spark.sql(s"SELECT * FROM `graft-manifest`.`$dir`").collect()
    }
    // streaming source: the refusal surfaces at stream construction or
    // first batch — either way typed, never silent rows
    val eStream = intercept[Throwable] {
      val q = spark.readStream.format("graft-manifest").load(dir)
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("fgate-ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def rootOf(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootOf(t.getCause)
    assert(rootOf(eStream).isInstanceOf[UnsupportedTableFeatureException] ||
      eStream.getMessage.contains("future-row-encryption"),
      s"stream refusal must be the typed feature error, got $eStream")
    // a WRITER reading the head refuses too: it cannot safely rebase
    // over facts it does not understand
    import spark.implicits._
    intercept[UnsupportedTableFeatureException] {
      ManifestLake.write(spark, Seq((9L, "z")).toDF("id", "v"), dir,
        Seq.empty, replace = false)
    }
  }

  test("advisory unknown directives stay ignorable; known required features read clean") {
    import spark.implicits._
    val dir = mkTable("fgate-adv")
    publishWithDirectives(dir,
      Seq("#somefutureadvisoryfact\thello", "#requires\tdeletion-vectors"))
    // unknown ADVISORY directive + known REQUIRED feature: reads fine
    assert(spark.read.format("graft-manifest").load(dir).count() === 3L)
  }

  test("deletion vectors auto-stamp #requires and the fact carries forward sticky") {
    import spark.implicits._
    val dir = freshDir("fgate-dv")
    ManifestLake.write(spark,
      (1L to 20L).map(i => (i, s"r$i")).toDF("id", "v"), dir, Seq.empty)
    assert(!rawManifest(dir, 1L).contains("#requires"),
      "a DV-free table must not carry the fact")
    // a DV delete introduces masks -> the commit stamps the fact
    ManifestLake.delete(spark, dir,
      org.apache.spark.sql.functions.col("id") === 7L, deletionVectors = true)
    val v2 = ManifestLake.currentVersion(spark, dir).get
    assert(rawManifest(dir, v2).contains("#requires\tdeletion-vectors"),
      s"DV commit must stamp the fact:\n${rawManifest(dir, v2)}")
    // a later plain append CARRIES it (sticky, no caller involvement)
    ManifestLake.write(spark, Seq((100L, "x")).toDF("id", "v"), dir,
      Seq.empty, replace = false)
    val v3 = ManifestLake.currentVersion(spark, dir).get
    assert(rawManifest(dir, v3).contains("#requires\tdeletion-vectors"))
    // the property surface shows the gating state
    val shown = spark.sql(s"SHOW TBLPROPERTIES `graft-manifest`.`$dir`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("graft.requiredFeatures") === Some("deletion-vectors"))
    // and a clone to a fresh root carries it across
    val cloneDir = freshDir("fgate-dv-clone")
    ManifestLake.shallowClone(spark, dir, cloneDir)
    val cv = ManifestLake.currentVersion(spark, cloneDir).get
    assert(rawManifest(cloneDir, cv).contains("#requires\tdeletion-vectors"))
    // masked read (the DV-aware entry point): 19 survivors + 1 appended
    assert(ManifestLake.read(spark, cloneDir).count() === 20L)
  }

  test("DROP FEATURE: refuses while evidence remains, succeeds after PURGE, history keeps its stamps") {
    import spark.implicits._
    val dir = freshDir("fgate-drop")
    val t = s"`graft-manifest`.`$dir`"
    ManifestLake.write(spark,
      (1L to 30L).map(i => (i, s"r$i")).toDF("id", "v"), dir, Seq.empty)
    ManifestLake.delete(spark, dir,
      org.apache.spark.sql.functions.col("id") === 3L, deletionVectors = true)
    val vDv = ManifestLake.currentVersion(spark, dir).get
    assert(rawManifest(dir, vDv).contains("#requires\tdeletion-vectors"))
    // masks still live: the drop must refuse with the remedy named
    val e = intercept[IllegalArgumentException](spark.sql(
      s"ALTER TABLE $t DROP FEATURE 'deletion-vectors'").collect())
    assert(e.getMessage.contains("PURGE"), e.getMessage)
    // an unknown feature refuses too (nothing to verify against)
    val e2 = intercept[IllegalArgumentException](spark.sql(
      s"ALTER TABLE $t DROP FEATURE 'no-such-feature'").collect())
    assert(e2.getMessage.contains("does not require"), e2.getMessage)
    // REORG ... APPLY (PURGE) materializes every mask; the drop then
    // succeeds as a metadata-only commit and the HEAD stamp is gone
    spark.sql(s"REORG TABLE $t APPLY (PURGE)").collect()
    val vClean = spark.sql(
      s"ALTER TABLE $t DROP FEATURE 'deletion-vectors'").head().getLong(0)
    assert(!rawManifest(dir, vClean).contains("#requires"),
      s"head must drop the fact:\n${rawManifest(dir, vClean)}")
    // the drop is a SELF-CONTAINED snapshot, never a delta: a delta
    // would resolve through chain bases whose headers still carry the
    // stamp, and an old reader walking the chain would refuse before
    // ever seeing the drop
    assert(!rawManifest(dir, vClean).contains("#delta"),
      "DROP FEATURE must snapshot so old readers never touch a stamped base")
    // sticky inheritance respects the drop: a later append stays clean
    ManifestLake.write(spark, Seq((100L, "x")).toDF("id", "v"), dir,
      Seq.empty, replace = false)
    val vApp = ManifestLake.currentVersion(spark, dir).get
    assert(!rawManifest(dir, vApp).contains("#requires"))
    // but the drop cannot rewrite history: the DV-era manifest keeps
    // its own stamp (a time-travel read of it genuinely depends on the
    // feature), and a FRESH DV delete re-stamps no matter the drop
    assert(rawManifest(dir, vDv).contains("#requires\tdeletion-vectors"))
    ManifestLake.delete(spark, dir,
      org.apache.spark.sql.functions.col("id") === 5L, deletionVectors = true)
    val vDv2 = ManifestLake.currentVersion(spark, dir).get
    assert(rawManifest(dir, vDv2).contains("#requires\tdeletion-vectors"),
      "evidence outruns any drop: fresh masks re-stamp")
    assert(ManifestLake.read(spark, dir).count() === 29L)
  }
}
