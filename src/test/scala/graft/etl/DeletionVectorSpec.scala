package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion vectors: row-level deletes that MARK rows instead of
  * rewriting files — `(file_path, row_index)` sidecars applied at scan
  * time. Pins: zero data-file movement, exact results incl. NULL-keep
  * semantics, accumulation across deletes, fully-masked file retirement,
  * compaction as DV garbage collection, vacuum keeping referenced
  * vectors, change-feed exactness, and the masked-table DSv1 refusal.
  */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("a DV delete moves zero data files, serves exact survivors, and accumulates across deletes") {
    import spark.implicits._
    val dir = freshDir("mlake-dv")
    val df = (0 until 100).map(i =>
      (s"chr${i % 2 + 1}", i.toLong,
        if (i % 10 == 0) null else s"p$i"))
      .toDF("chrom", "pos", "payload")
    ManifestLake.write(spark, df, dir, Seq("chrom"), statsCols = Seq("pos"))   // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val before = ManifestLake.readManifest(fs, root, 1L).files
      .map(f => f.path -> f.bytes).toMap

    // NULL-keep semantics through the mask: payload NULL rows survive
    // a payload-referencing predicate
    assert(ManifestLake.delete(spark, dir,
      col("payload").endsWith("1") && col("pos") < 50L,
      deletionVectors = true) === 2L)
    val m2 = ManifestLake.readManifest(fs, root, 2L)
    assert(m2.files.map(f => f.path -> f.bytes).toMap === before,
      "a DV delete must not move, add, or remove any data file")
    val masked2 = m2.files.filter(_.dv.isDefined)
    assert(masked2.nonEmpty && masked2.flatMap(_.dvRows).sum === 5L,
      s"pos 1,11,21,31,41 masked, got ${masked2.flatMap(_.dvRows).sum}")
    val r2 = ManifestLake.read(spark, dir)
    assert(r2.count() === 95)
    assert(r2.where(col("pos") === 11L).count() === 0)
    assert(r2.where(col("pos") === 10L).count() === 1, "NULL payload row must survive")
    assert(r2.where(col("pos") === 51L).count() === 1)

    // second DV delete ACCUMULATES on already-masked files — and the
    // already-masked pos=1 row is INVISIBLE to it (no double-mask)
    assert(ManifestLake.delete(spark, dir, col("pos") < 4L,
      deletionVectors = true) === 3L)
    val r3 = ManifestLake.read(spark, dir)
    assert(r3.count() === 92) // pos 0,2,3 newly masked; 1 was already gone
    assert(r3.where(col("pos") < 4L).count() === 0)
    assert(r3.where(col("pos") === 11L).count() === 0,
      "the first delete's mask must survive the second")
    val m3 = ManifestLake.readManifest(fs, root, 3L)
    assert(m3.files.map(_.path).toSet === m2.files.map(_.path).toSet)
    assert(m3.files.flatMap(_.dvRows).sum === 8L)

    // time travel: each version serves its own mask state
    assert(ManifestLake.readVersion(spark, dir, 1L).count() === 100)
    assert(ManifestLake.readVersion(spark, dir, 2L).count() === 95)

    // the change feed serves the exact masked rows as deletes
    val feed = ManifestLake.readChangeFeed(spark, dir, 1L, 3L)
    assert(feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("delete" -> 8L))
    assert(feed.where(col("_commit_version") === 3L)
      .select("pos").collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 2L, 3L),
      "already-masked rows must not re-report as deleted")

    // raw DSv1 relation refuses masked tables typed
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest").load(dir).collect()
    }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("fully-masked files retire from the live set; compaction materializes masks and clears vectors") {
    import spark.implicits._
    val dir = freshDir("mlake-dv-gc")
    val df = (0 until 60).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
      .toDF("chrom", "pos", "payload")
    ManifestLake.write(spark, df.repartition(6), dir, Seq("chrom"),
      statsCols = Seq("pos"))                                                  // v1
    // mask SOME rows, then compact: the rewrite applies the mask and
    // the new files carry no vectors
    ManifestLake.delete(spark, dir, col("pos") % 3 === 0, deletionVectors = true) // v2
    assert(ManifestLake.read(spark, dir).count() === 40)
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 2L).files.exists(_.dv.isDefined))
    ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)              // v3
    val m3 = ManifestLake.readManifest(fs, root, 3L)
    assert(m3.files.forall(_.dv.isEmpty), "compaction must clear deletion vectors")
    val r3 = ManifestLake.read(spark, dir)
    assert(r3.count() === 40)
    assert(r3.where(col("pos") % 3 === 0).count() === 0)

    // masking EVERY row of a partition's files retires them by reference
    ManifestLake.delete(spark, dir, col("chrom") === "chr2" && col("pos") >= 0L,
      deletionVectors = true)                                                  // v4
    val m4 = ManifestLake.readManifest(fs, root, 4L)
    assert(!m4.files.exists(_.path.contains("chrom=chr2")),
      "fully-masked files must leave the live set, not carry pointless vectors")
    assert(ManifestLake.read(spark, dir).where(col("chrom") === "chr2").count() === 0)

    // vacuum keeps vectors referenced by kept versions, reaps them with
    // their version below the horizon
    ManifestLake.delete(spark, dir, col("pos") === 2L, deletionVectors = true) // v5
    val dvDirs = ManifestLake.readManifest(fs, root, 5L).files.flatMap(_.dv).distinct
    assert(dvDirs.nonEmpty)
    ManifestLake.vacuum(spark, dir, keepVersions = 2)
    dvDirs.foreach(d => assert(
      fs.exists(new org.apache.hadoop.fs.Path(root, d)),
      s"a kept version's deletion vector must survive vacuum: $d"))
    assert(ManifestLake.read(spark, dir).where(col("pos") === 2L).count() === 0)
  }

  test("row ids are stable across appends, metadata ops, and DV masks; rewrites re-home exactly the rewritten rows") {
    import spark.implicits._
    val dir = freshDir("mlake-rowids")
    ManifestLake.write(spark,
      (0 until 20).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                       // v1
    def ids() = ManifestLake.readWithRowIds(spark, dir)
      .select("pos", "_row_file", "_row_index")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val v1 = ids()
    assert(v1.size === 20)
    assert(v1.values.map(_._1).forall(_.startsWith("data/v")),
      "row files must be manifest-relative paths")
    // the pair is unique per row
    assert(v1.values.toSet.size === 20)
    // appends + metadata ops leave existing ids untouched
    ManifestLake.write(spark, Seq(("chr1", 100L, "new")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), replace = false)                                      // v2
    ManifestLake.addConstraint(spark, dir, "pos_ok", "pos >= 0")               // v3
    ManifestLake.renameColumn(spark, dir, "payload", "body")                   // v4
    val v4 = ids()
    assert(v4.size === 21)
    (0 until 20).foreach(i => assert(v4(i.toLong) === v1(i.toLong),
      s"row $i must keep its identity across append/constraint/rename"))
    // a DV mask removes rows WITHOUT re-homing the survivors
    ManifestLake.delete(spark, dir, col("pos") < 3L, deletionVectors = true)   // v5
    val v5 = ids()
    assert(v5.size === 18)
    (3 until 20).foreach(i => assert(v5(i.toLong) === v1(i.toLong)))
    // an upsert rewrites ONLY its affected partition: chr2 rows (odd
    // pos) keep their ids, chr1 rows re-home
    ManifestLake.upsert(spark, dir,
      Seq(("chr1", 4L, "UPD")).toDF("chrom", "pos", "body"),
      Seq("chrom"), Seq("chrom", "pos"))                                       // v6
    val v6 = ids()
    (3 until 20).filter(_ % 2 == 1).foreach(i =>
      assert(v6(i.toLong) === v1(i.toLong), s"untouched chr2 row $i keeps its id"))
    (4 until 20).filter(_ % 2 == 0).foreach(i =>
      assert(v6(i.toLong) !== v1(i.toLong), s"rewritten chr1 row $i re-homes"))
  }

  test("DV deletes stay exact over NESTED columns (array<struct> — the genomic lake shape)") {
    import spark.implicits._
    val dir = freshDir("mlake-dv-nested")
    val df = (0 until 30).map(i =>
      (s"chr${i % 2 + 1}", i.toLong,
        Seq((s"s$i", i * 1.5), (s"t$i", i * 2.5))))
      .toDF("chrom", "pos", "entries")
      .select(col("chrom"), col("pos"),
        col("entries").cast("array<struct<id:string,qual:double>>").as("entries"))
    ManifestLake.write(spark, df, dir, Seq("chrom"))                           // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val before = ManifestLake.readManifest(fs, root, 1L).files.map(_.path).toSet
    // predicate over a NESTED field forces the data path; DV mode masks
    assert(ManifestLake.delete(spark, dir,
      element_at(col("entries"), 1).getField("qual") < 6.0,
      deletionVectors = true) === 2L)
    assert(ManifestLake.readManifest(fs, root, 2L).files.map(_.path).toSet === before)
    val got = ManifestLake.read(spark, dir)
    // qual = pos * 1.5 < 6.0 → pos 0..3 masked
    assert(got.count() === 26)
    assert(got.where(col("pos") < 4L).count() === 0)
    // nested content of survivors intact
    assert(got.where(col("pos") === 10L)
      .select(element_at(col("entries"), 2).getField("id"))
      .collect().head.getString(0) === "t10")
    // and a second, top-level-column DV delete still composes
    assert(ManifestLake.delete(spark, dir, col("pos") === 20L,
      deletionVectors = true) === 3L)
    assert(ManifestLake.read(spark, dir).count() === 25)
  }

  test("upsert and merge on DV-masked partitions stay exact; racing DV deletes on one file conflict") {
    import spark.implicits._
    val dir = freshDir("mlake-dv-dml")
    ManifestLake.write(spark,
      (0 until 20).map(i => (s"chr1", i.toLong, s"p$i")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.delete(spark, dir, col("pos") < 5L, deletionVectors = true)   // v2
    // upsert reads the affected partition MASKED: the rewrite must not
    // resurrect the masked rows
    ManifestLake.upsert(spark, dir,
      Seq(("chr1", 10L, "UPDATED")).toDF("chrom", "pos", "payload"),
      Seq("chrom"), Seq("chrom", "pos"))                                       // v3
    val r3 = ManifestLake.read(spark, dir)
    assert(r3.count() === 15)
    assert(r3.where(col("pos") < 5L).count() === 0,
      "an upsert rewrite must not resurrect DV-masked rows")
    assert(r3.where(col("payload") === "UPDATED").count() === 1)
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 3L).files.forall(_.dv.isEmpty),
      "the upsert rewrite materializes the affected partition's masks")

    // merge over a masked partition: same exactness
    ManifestLake.delete(spark, dir, col("pos") === 19L, deletionVectors = true) // v4
    val st = ManifestLake.merge(spark, dir,
      Seq(("chr1", 18L, "MERGED"), ("chr1", 100L, "NEW"))
        .toDF("chrom", "pos", "payload"),
      Seq("chrom"), Seq("chrom", "pos"))                                       // v5
    assert(st.updated === 1L && st.inserted === 1L)
    val r5 = ManifestLake.read(spark, dir)
    assert(r5.count() === 15)
    assert(r5.where(col("pos") === 19L).count() === 0)

    // two DV deletes racing on the SAME file: the loser must conflict
    // (entry equality), never silently undo the winner's mask
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    ManifestLake.raceHook.set { _ =>
      Await.result(Future {
        spark.sparkContext.clearJobGroup()
        ManifestLake.delete(spark, dir, col("pos") === 17L, deletionVectors = true)
      }, 2.minutes): Unit
    }
    val e = try intercept[IllegalStateException] {
      ManifestLake.delete(spark, dir, col("pos") === 18L, deletionVectors = true)
    } finally ManifestLake.raceHook.set(null)
    assert(e.getMessage.contains("re-masked") || e.getMessage.contains("lost its race"))
    val after = ManifestLake.read(spark, dir)
    assert(after.where(col("pos") === 17L).count() === 0, "the winner's mask holds")
    assert(after.where(col("pos") === 18L).count() === 1, "the loser's intent must not half-apply")
  }

  test("deletion vectors are root-relative: masks survive a table move, like every other manifest reference") {
    import spark.implicits._
    val dir = freshDir("mlake-dv-move")
    ManifestLake.write(spark,
      (0 until 40).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.delete(spark, dir, col("pos") < 5L, deletionVectors = true)   // v2
    // a second delete exercises the carry-in path (existing masked rows
    // re-home into the new vector dir, normalized on the way through)
    ManifestLake.delete(spark, dir, col("pos") === 10L, deletionVectors = true) // v3
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val dvDirs = ManifestLake.readManifest(fs, root, 3L).files.flatMap(_.dv).distinct
    assert(dvDirs.nonEmpty)
    // the stored paths are manifest-relative — the relocatability contract
    val stored = spark.read.parquet(dvDirs.map(d =>
      new org.apache.hadoop.fs.Path(root, d).toString): _*)
      .select("file_path").distinct().collect().map(_.getString(0))
    assert(stored.nonEmpty && stored.forall(_.startsWith("data/v")),
      s"DV file_path must be root-relative, got: ${stored.take(3).mkString(", ")}")
    assert(ManifestLake.read(spark, dir).count() === 34)

    // MOVE the whole table directory: masks must still apply at the new
    // mount point (absolute URIs would silently resurrect the 6 rows)
    val dest = Files.createTempDirectory("mlake-dv-moved").toString + "/table"
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dest))
    val moved = ManifestLake.read(spark, dest)
    assert(moved.count() === 34,
      "moving the table must not resurrect DV-deleted rows")
    assert(moved.where(col("pos") < 5L).count() === 0)
    assert(moved.where(col("pos") === 10L).count() === 0)
    // and the moved table keeps taking DV deletes
    assert(ManifestLake.delete(spark, dest, col("pos") === 11L,
      deletionVectors = true) === 4L) // publishes v4
    assert(ManifestLake.read(spark, dest).count() === 33)
  }

  test("a '+' in a partition value survives the reader-path decode: successive DV deletes on one file accumulate, not resurrect") {
    import spark.implicits._
    val dir = freshDir("mlake-dv-plus")
    // '+' is NOT Hive-escaped in partition dir names, but it IS form
    // decoding's space marker: a reader path decoded with url_decode
    // alone turns 'gr+A' into 'gr A', the derived relative path never
    // equals the manifest entry, and the second delete's carry-forward
    // silently DROPS the first delete's mask rows while still counting
    // them — deleted rows resurrect. Decoding must be URI-style.
    val df = (0 until 60).map(i =>
      (if (i % 2 == 0) "gr+A" else "b c", i.toLong, s"p$i"))
      .toDF("grp", "pos", "payload")
    ManifestLake.write(spark, df, dir, Seq("grp"), statsCols = Seq("pos"))     // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 1L).files
      .exists(_.path.contains("grp=gr+A")), "fixture must hit the raw-'+' dir")

    assert(ManifestLake.delete(spark, dir,
      col("grp") === "gr+A" && col("pos") < 10L, deletionVectors = true) === 2L) // v2
    assert(ManifestLake.read(spark, dir).count() === 55) // 5 even pos < 10 masked
    // second DV delete on the SAME '+'-partition file: the carry-forward
    // must re-home the first mask's rows, not drop them
    assert(ManifestLake.delete(spark, dir,
      col("grp") === "gr+A" && col("pos") < 14L, deletionVectors = true) === 3L) // v3
    val r = ManifestLake.read(spark, dir)
    assert(r.count() === 53, "first delete's masks must survive the second")
    assert(r.where(col("pos") === 2L).count() === 0,
      "v2-masked row resurrected: reader-path decode diverged from the manifest path")
    assert(r.where(col("pos") === 12L).count() === 0)
    val m3 = ManifestLake.readManifest(fs, root, 3L)
    assert(m3.files.flatMap(_.dvRows).sum === 7L)
    // dvRows accounting matches what the scan actually masks
    assert(ManifestLake.read(spark, dir).count() ===
      m3.files.flatMap(_.rows).sum - 7L)
    // _row_file derives through the same decode — it must equal the
    // manifest's stored entry path for the '+' partition
    val rf = ManifestLake.readWithRowIds(spark, dir)
      .where(col("grp") === "gr+A").select("_row_file")
      .distinct().collect().map(_.getString(0)).toSet
    assert(rf.subsetOf(m3.files.map(_.path).toSet),
      s"_row_file must match manifest entry paths, got: ${rf.take(2).mkString(", ")}")

    // space-bearing partition ('b c' — literal on disk, '%20' in the
    // reader's URL-encoded path) keeps decoding correctly too — the
    // %2B pre-escape must not break genuine %-decoding
    assert(ManifestLake.delete(spark, dir,
      col("grp") === "b c" && col("pos") === 1L, deletionVectors = true) === 4L) // v4
    assert(ManifestLake.read(spark, dir).count() === 52)
  }

  test("maintain rewrites only the files whose masked fraction crossed the threshold — DV masks converge to zero") {
    import spark.implicits._
    val dir = freshDir("mlake-dv-maintain")
    // deterministic layout: four single-file appends of 25 contiguous
    // pos each, so a range delete concentrates its masks in ONE file
    def chunk(k: Int) = ((k * 25) until ((k + 1) * 25))
      .map(i => ("chr1", i.toLong, s"p$i")).toDF("chrom", "pos", "payload")
      .coalesce(1)
    ManifestLake.write(spark, chunk(0), dir, Seq("chrom"),
      statsCols = Seq("pos"))                                                // v1
    (1 to 3).foreach(k => ManifestLake.write(spark, chunk(k), dir,
      Seq("chrom"), replace = false, statsCols = Seq("pos")))                // v2..v4
    // mask 80% of file0 and ONE row of file1
    ManifestLake.delete(spark, dir, col("pos") < 20L, deletionVectors = true) // v5
    ManifestLake.delete(spark, dir, col("pos") === 30L, deletionVectors = true) // v6
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m6 = ManifestLake.readManifest(fs, root, 6L)
    assert(m6.files.length === 4 && m6.files.count(_.dv.isDefined) === 2)
    val cleanBefore = m6.files.filter(_.dv.isEmpty).map(_.path).toSet
    val lightMasked = m6.files.find(f => f.dvRows.contains(1L)).get
    // targetBytes=1 makes want >= file count, disabling fragmentation
    // compaction: ONLY the DV threshold can trigger a rewrite
    ManifestLake.maintain(spark, dir, targetBytes = 1L, keepVersions = 10,
      maxMaskedFraction = 0.2)                                               // v7
    val m7 = ManifestLake.readManifest(fs, root, 7L)
    assert(cleanBefore.subsetOf(m7.files.map(_.path).toSet),
      "clean files must carry by reference, not rewrite")
    assert(m7.files.map(_.path).contains(lightMasked.path),
      "a below-threshold masked file must not rewrite")
    assert(m7.files.count(_.dv.isDefined) === 1,
      "the heavily-masked file must have materialized its mask")
    val r7 = ManifestLake.read(spark, dir)
    assert(r7.count() === 79)
    assert(r7.where(col("pos") < 20L || col("pos") === 30L).count() === 0)
    // push file1 over the threshold: the table converges to mask-free
    // under repeated maintenance
    ManifestLake.delete(spark, dir, col("pos") >= 26L && col("pos") <= 45L,
      deletionVectors = true)                                                // v8
    ManifestLake.maintain(spark, dir, targetBytes = 1L, keepVersions = 10,
      maxMaskedFraction = 0.2)                                               // v9
    val m9 = ManifestLake.readManifest(fs, root, 9L)
    assert(m9.files.forall(_.dv.isEmpty),
      "repeated DV deletes + maintain must converge to mask-free files")
    val r9 = ManifestLake.read(spark, dir)
    assert(r9.count() === 60)
    assert(r9.where(col("pos") === 25L).count() === 1)
    assert(r9.where(col("pos") === 46L).count() === 1)
  }
}
