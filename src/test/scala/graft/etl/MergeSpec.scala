package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conditional MERGE INTO on the manifest lake: clause semantics
  * (delete-before-update precedence, condition nulls as false,
  * unmatched-target survival), exact change-feed stamping, by-reference
  * partition carry, and equivalence with upsert under the defaults.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("clause matrix: delete wins over update, conditions gate each clause, unmatched target survives") {
    import spark.implicits._
    val dir = freshDir("mlake-merge")
    val base = Seq(
      ("chr1", 1L, "keep-me", 10),
      ("chr1", 2L, "update-me", 10),
      ("chr1", 3L, "delete-me", 10),
      ("chr1", 4L, "cond-fails", 10),
      ("chr2", 9L, "untouched-partition", 10))
      .toDF("chrom", "pos", "payload", "score")
    ManifestLake.write(spark, base, dir, Seq("chrom"), statsCols = Seq("pos")) // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val chr2Files = ManifestLake.readManifest(fs, root, 1L).files
      .filter(_.path.contains("chrom=chr2")).toSet

    val source = Seq(
      ("chr1", 2L, "UPDATED", 50),     // matched, update cond true (score 50 > 20)
      ("chr1", 3L, "TOMBSTONE", -1),   // matched, delete cond true (negative score)
      ("chr1", 4L, "no-op", 15),       // matched, neither cond true -> target kept
      ("chr1", 5L, "INSERTED", 99),    // unmatched, insert cond true
      ("chr1", 6L, "too-small", 1))    // unmatched, insert cond false
      .toDF("chrom", "pos", "payload", "score")

    val st = ManifestLake.merge(spark, dir, source,
      Seq("chrom"), Seq("chrom", "pos"),
      updateWhen = Some(col("s.score") > 20),
      deleteWhen = Some(col("s.score") < 0),
      insertWhen = Some(col("s.score") > 10))
    assert(st === ManifestLake.MergeStats(2L, updated = 1L, deleted = 1L, inserted = 1L))

    val got = ManifestLake.read(spark, dir).orderBy("pos")
      .select("pos", "payload", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq === Seq(
      (1L, "keep-me", 10),          // no source match: survives
      (2L, "UPDATED", 50),          // updated
      (4L, "cond-fails", 10),       // matched, no clause fired: kept
      (5L, "INSERTED", 99),         // inserted
      (9L, "untouched-partition", 10)))
    // pos 3 deleted; pos 6 ignored (insert condition false)

    // the untouched partition's files carried BY REFERENCE
    val m2 = ManifestLake.readManifest(fs, root, 2L)
    assert(m2.op === Some("merge"))
    assert(m2.files.filter(_.path.contains("chrom=chr2")).toSet === chr2Files)

    // the change feed serves the exact clause-level deltas
    val feed = ManifestLake.readChangeFeed(spark, dir, 1L, 2L)
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L, "insert" -> 1L))
    assert(feed.where(col("_change_type") === "delete")
      .select("payload").collect().head.getString(0) === "delete-me")
    assert(feed.where(col("_change_type") === "update_postimage")
      .select("payload").collect().head.getString(0) === "UPDATED")
  }

  test("a NULL condition is false (CHECK-style); defaults make merge equal upsert; key-dup source refuses") {
    import spark.implicits._
    val dir = freshDir("mlake-merge-null")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "a", Some(5)), ("chr1", 2L, "b", None: Option[Int]))
        .toDF("chrom", "pos", "payload", "score"),
      dir, Seq("chrom"))                                                       // v1
    // delete condition references t.score, NULL on pos=2: row survives
    val st = ManifestLake.merge(spark, dir,
      Seq(("chr1", 1L, "A2", Some(9)), ("chr1", 2L, "B2", Some(9)))
        .toDF("chrom", "pos", "payload", "score"),
      Seq("chrom"), Seq("chrom", "pos"),
      updateWhen = None,
      deleteWhen = Some(col("t.score") < 100),
      insertWhen = None)
    assert(st.deleted === 1L && st.updated === 0L && st.inserted === 0L)
    val left = ManifestLake.read(spark, dir)
    assert(left.count() === 1)
    assert(left.select("pos").collect().head.getLong(0) === 2L,
      "NULL delete condition must KEEP the row (null-as-false)")

    // defaults == upsert, on a twin pair of tables
    val a = freshDir("mlake-merge-twin-a"); val b = freshDir("mlake-merge-twin-b")
    val init = (0 until 20).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
      .toDF("chrom", "pos", "payload")
    val batch = Seq(("chr1", 0L, "U"), ("chr1", 777L, "NEW")).toDF("chrom", "pos", "payload")
    ManifestLake.write(spark, init, a, Seq("chrom"))
    ManifestLake.write(spark, init, b, Seq("chrom"))
    ManifestLake.upsert(spark, a, batch, Seq("chrom"), Seq("chrom", "pos"))
    ManifestLake.merge(spark, b, batch, Seq("chrom"), Seq("chrom", "pos"))
    val ra = ManifestLake.read(spark, a)
    val rb = ManifestLake.read(spark, b)
    assert(ra.count() === rb.count())
    assert(ra.except(rb).isEmpty && rb.except(ra).isEmpty)

    intercept[IllegalArgumentException] {
      ManifestLake.merge(spark, dir,
        Seq(("chr1", 2L, "x", Some(1)), ("chr1", 2L, "y", Some(2)))
          .toDF("chrom", "pos", "payload", "score"),
        Seq("chrom"), Seq("chrom", "pos"))
    }
  }

  test("merge respects CHECK constraints and column mapping; txn ledger makes it exactly-once") {
    import spark.implicits._
    val dir = freshDir("mlake-merge-guard")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "a", 5)).toDF("chrom", "pos", "payload", "score"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.addConstraint(spark, dir, "score_nonneg", "score >= 0")       // v2
    ManifestLake.renameColumn(spark, dir, "payload", "body")                   // v3
    // a violating source row (score -1) must fail pre-publish
    intercept[IllegalStateException] {
      ManifestLake.merge(spark, dir,
        Seq(("chr1", 2L, "bad", -1)).toDF("chrom", "pos", "body", "score"),
        Seq("chrom"), Seq("chrom", "pos"))
    }
    assert(ManifestLake.currentVersion(spark, dir) === Some(3L))
    // a passing merge lands through the mapping, with conditions over
    // the LOGICAL names
    val st = ManifestLake.merge(spark, dir,
      Seq(("chr1", 1L, "A", 50), ("chr1", 2L, "B", 60))
        .toDF("chrom", "pos", "body", "score"),
      Seq("chrom"), Seq("chrom", "pos"),
      updateWhen = Some(col("s.body") === "A"),
      txn = Some(("merge-app", 1L)))                                           // v4
    assert(st.version === 4L && st.updated === 1L && st.inserted === 1L)
    val got = ManifestLake.read(spark, dir).orderBy("pos")
    assert(got.schema.fieldNames.toSeq === Seq("chrom", "pos", "body", "score"))
    assert(got.select("body").collect().map(_.getString(0)).toSeq === Seq("A", "B"))
    // replayed batch: ledger short-circuits, nothing changes
    val st2 = ManifestLake.merge(spark, dir,
      Seq(("chr1", 9L, "GHOST", 1)).toDF("chrom", "pos", "body", "score"),
      Seq("chrom"), Seq("chrom", "pos"), txn = Some(("merge-app", 1L)))
    assert(st2 === ManifestLake.MergeStats(4L, 0L, 0L, 0L))
    assert(ManifestLake.read(spark, dir).count() === 2)
  }

  test("merge evaluates its source exactly once (validation rides the classification, not pre-scans)") {
    import spark.implicits._
    val dir = freshDir("mlake-merge-onepass")
    ManifestLake.write(spark,
      (0 until 20).map(i => ("chr1", i.toLong, s"p$i")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))
    // every evaluation of a source row ticks the accumulator: with the
    // source pinned and validation folded into the classify pass, the
    // whole merge computes each row ONCE (the old shape paid 4 passes:
    // count, distinct-count, partition discovery, classify)
    val acc = spark.sparkContext.longAccumulator("src-evals")
    val rdd = spark.sparkContext.parallelize(0 until 50, 4)
      .map { i => acc.add(1); ("chr1", i.toLong, s"s$i") }
    val srcDf = spark.createDataFrame(rdd).toDF("chrom", "pos", "payload")
    val st = ManifestLake.merge(spark, dir, srcDf, Seq("chrom"), Seq("chrom", "pos"))
    assert(st.updated === 20L && st.inserted === 30L)
    assert(acc.value === 50L,
      s"merge must evaluate the source once; rows computed ${acc.value} times for 50 rows")
    assert(ManifestLake.read(spark, dir).count() === 50)
    // and the in-classification duplicate check still refuses dup keys
    // while distinguishing them from a key matching several target rows
    val dup = Seq(("chr1", 1L, "x"), ("chr1", 1L, "y")).toDF("chrom", "pos", "payload")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.merge(spark, dir, dup, Seq("chrom"), Seq("chrom", "pos"))
    }
    assert(e.getMessage.contains("not key-unique"))
    assert(ManifestLake.read(spark, dir).count() === 50, "nothing may publish")
  }

  test("superset source: condition-only columns route clauses and never land in the table") {
    import spark.implicits._
    val dir = freshDir("mlake-merge-superset")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "keep"), ("chr1", 2L, "stale"), ("chr1", 3L, "doomed"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))
    // the CDC-apply shape: source carries an op marker the table never
    // stores; clauses read it as s.op
    val src = Seq(("chr1", 2L, "fresh", "u"), ("chr1", 3L, "", "d"),
      ("chr1", 4L, "new", "u"), ("chr1", 9L, "", "d"))
      .toDF("chrom", "pos", "payload", "op")
    val st = ManifestLake.merge(spark, dir, src, Seq("chrom"), Seq("chrom", "pos"),
      updateWhen = Some(col("s.op") === "u"),
      deleteWhen = Some(col("s.op") === "d"),
      insertWhen = Some(col("s.op") =!= "d"))
    assert(st === ManifestLake.MergeStats(2L, 1L, 1L, 1L))
    val r = ManifestLake.read(spark, dir)
    assert(r.schema.fieldNames.toSeq === Seq("chrom", "pos", "payload"),
      "the condition-only column must not land in the table")
    assert(r.collect().map(x => x.getLong(1) -> x.getString(2)).toMap ===
      Map(1L -> "keep", 2L -> "fresh", 4L -> "new"))
    // a source MISSING a table column still refuses loudly
    val e = intercept[IllegalArgumentException] {
      ManifestLake.merge(spark, dir, Seq(("chr1", 5L)).toDF("chrom", "pos"),
        Seq("chrom"), Seq("chrom", "pos"))
    }
    assert(e.getMessage.contains("missing or re-typed"))
  }

  test("WITH SCHEMA EVOLUTION keeps the retry path: a benign disjoint-partition race retries and lands, evolved column intact") {
    import spark.implicits._
    val dir = freshDir("mlake-merge-evoretry")
    ManifestLake.write(spark,
      Seq(("aa", 1L, "p1"), ("bb", 2L, "p2")).toDF("grp", "id", "payload"),
      dir, Seq("grp"))                                                   // v1
    // the racing commit appends to a DISJOINT partition right before
    // the merge's first publish attempt — the lost version race must
    // RETRY (the head's shape re-evolves to the same result), never
    // throw, even though the in-memory manifest is the evolved one
    ManifestLake.raceHook.set { _ =>
      ManifestLake.write(spark, Seq(("cc", 9L, "p9")).toDF("grp", "id", "payload"),
        dir, Seq("grp"), replace = false)
    }
    try {
      val src = Seq(("aa", 1L, "U1", "new1"), ("aa", 3L, "I3", "new3"))
        .toDF("grp", "id", "payload", "note")
      val st = ManifestLake.mergeClauses(spark, dir, src,
        Seq("grp"), Seq("grp", "id"),
        matched = Seq(ManifestLake.MergeUpdate()),
        notMatched = Seq(ManifestLake.MergeInsert()),
        evolveWith = Some(src.schema))
      assert(st.version === 3L,
        s"the merge must land AFTER the racing append (v2) via retry, got v${st.version}")
      val r = ManifestLake.read(spark, dir)
      assert(r.columns.contains("note"))
      assert(r.count() === 4L, "both the race's row and the merge's rows are live")
      assert(r.where(col("id") === 1L).select("note").as[String].head() === "new1")
      assert(r.where(col("id") === 9L && col("note").isNull).count() === 1L,
        "the raced row serves NULL for the evolved column")
      assert(r.where(col("id") === 2L).select("payload").as[String].head() === "p2")
    } finally ManifestLake.raceHook.set(null)
  }

  test("WITH SCHEMA EVOLUTION still loses a race that touches its affected partitions — loudly, no schema residue") {
    import spark.implicits._
    val dir = freshDir("mlake-merge-evoconflict")
    ManifestLake.write(spark,
      Seq(("aa", 1L, "p1"), ("bb", 2L, "p2")).toDF("grp", "id", "payload"),
      dir, Seq("grp"))                                                   // v1
    ManifestLake.raceHook.set { _ =>
      // the racer rewrites the SAME partition the merge staged against
      ManifestLake.upsert(spark, dir,
        Seq(("aa", 1L, "RACED")).toDF("grp", "id", "payload"),
        Seq("grp"), Seq("grp", "id"))
    }
    try {
      val src = Seq(("aa", 1L, "U1", "n1")).toDF("grp", "id", "payload", "note")
      val e = intercept[IllegalStateException] {
        ManifestLake.mergeClauses(spark, dir, src,
          Seq("grp"), Seq("grp", "id"),
          matched = Seq(ManifestLake.MergeUpdate()),
          evolveWith = Some(src.schema))
      }
      assert(e.getMessage.contains("lost its race"), e.getMessage)
      // no schema residue: the head is the racer's, WITHOUT the column
      val r = ManifestLake.read(spark, dir)
      assert(!r.columns.contains("note"))
      assert(r.where(col("id") === 1L).select("payload").as[String].head() === "RACED")
    } finally ManifestLake.raceHook.set(null)
  }
}
