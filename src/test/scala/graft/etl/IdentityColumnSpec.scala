package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GENERATED ALWAYS AS IDENTITY: engine-assigned BIGINT values from a
  * manifest header fact (column, start, step, watermark). Values are
  * unique, move in step's direction, gaps are expected (per-partition
  * lanes); concurrent appends get DISJOINT ranges via withdraw-and-
  * restage on a moved watermark; the watermark never resets (a replace
  * keeps numbering above history).
  */
class IdentityColumnSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def ids(path: String): Seq[Long] = {
    import spark.implicits._
    ManifestLake.read(spark, path).select("id").as[Long].collect().toSeq
  }

  test("CREATE + INSERT assigns unique stepping values; SHOW CREATE renders the clause") {
    val dir = freshDir("ident-basic")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3), " +
      "payload STRING) USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'p1'), ('b', 'p2')")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'p3')")
    val got = ids(dir)
    assert(got.distinct.size === 3, s"values must be unique, got $got")
    assert(got.forall(v => v >= 100 && (v - 100) % 3 == 0),
      s"values must sit on the start/step lattice, got $got")
    // the second statement's values sit strictly above the first's
    val firstMax = spark.sql(s"SELECT max(id) FROM $t WHERE payload IN ('p1','p2')")
      .head().getLong(0)
    val third = spark.sql(s"SELECT id FROM $t WHERE payload = 'p3'")
      .head().getLong(0)
    assert(third > firstMax, "later statements number above earlier ones")
    val ddl = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(ddl.contains("GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3)"), ddl)
    // positional INSERT supplies everything EXCEPT the identity column
    spark.sql(s"INSERT INTO $t VALUES ('b', 'p4')")
    assert(ids(dir).distinct.size === 4)
  }

  test("concurrent appends restage on a moved watermark: both land, ranges disjoint") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir("ident-race")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    (1 to 3).foreach { round =>
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val writes = Seq("x", "y").map(tag => Future {
        barrier.await()
        ManifestLake.write(spark,
          (0 until 50).map(i => (s"g${i % 2}", s"$tag$round-$i"))
            .toDF("grp", "payload").repartition(4),
          dir, Seq("grp"), replace = false)
      })
      Await.result(Future.sequence(writes), 120.seconds)
      val got = ids(dir)
      assert(got.distinct.size === got.size,
        s"round $round: racing appends produced overlapping identity " +
          s"values (${got.size} rows, ${got.distinct.size} distinct)")
    }
    assert(ids(dir).size === 300)
  }

  test("two identity writers racing a REPLACE: every surviving id unique " +
    "across readable history, watermark never regresses") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir("ident-race-repl")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('g0', 'seed')")
    def wmOf(): Long = {
      val (fs, root) = ManifestLake.fsFor(spark, dir)
      ManifestLake.readManifest(fs, root,
        ManifestLake.currentVersion(spark, dir).get).identity.get._4
    }
    (1 to 3).foreach { round =>
      val wmBefore = wmOf()
      val barrier = new java.util.concurrent.CyclicBarrier(3)
      // a REPLACE that loses the version race fails LOUDLY by contract
      // (replace never rebases — the caller re-runs); appends restage.
      // Tolerate exactly that typed loss; anything else is a real bug.
      def run(fn: () => Unit) = Future {
        barrier.await()
        try { fn(); true } catch {
          case e: IllegalStateException
            if Option(e.getMessage).exists(m =>
              m.contains("race") && m.contains("intact")) => false
        }
      }
      def appender(tag: String) = run(() =>
        ManifestLake.write(spark,
          (0 until 30).map(i => (s"g${i % 2}", s"$tag$round-$i"))
            .toDF("grp", "payload").repartition(3),
          dir, Seq("grp"), replace = false): Unit)
      val replacer = run(() =>
        ManifestLake.write(spark,
          (0 until 10).map(i => (s"g${i % 2}", s"r$round-$i"))
            .toDF("grp", "payload").repartition(2),
          dir, Seq("grp"), replace = true): Unit)
      val landed = Await.result(Future.sequence(
        Seq(appender("x"), appender("y"), replacer)), 180.seconds)
      assert(landed.contains(true), s"round $round: nobody committed")
      assert(wmOf() > wmBefore, s"round $round: watermark must advance")
      // ids unique across EVERY surviving version (readable history),
      // not just the head — a replace must never free ids for reuse
      val all = ManifestLake.versions(spark, dir).map(_._1).flatMap { v =>
        ManifestLake.readVersion(spark, dir, v)
          .select("id").as[Long].collect().toSeq.map(v -> _)
      }
      val perVersion = all.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      perVersion.foreach { case (v, vi) =>
        assert(vi.distinct.size === vi.size,
          s"round $round v$v: duplicate identity values ${vi.groupBy(identity)
            .filter(_._2.size > 1).keys.take(5).mkString(", ")}")
      }
      // cross-version: an id present in two versions must name rows
      // written by ONE commit (values never reassign) — equivalently,
      // the watermark after the round clears every id ever seen
      assert(all.map(_._2).max < wmOf(),
        s"round $round: watermark must clear every assigned id")
    }
  }

  test("watermark survives replace and delete: numbering never reuses live history") {
    import spark.implicits._
    val dir = freshDir("ident-replace")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'old1'), ('a', 'old2')")
    val oldMax = spark.sql(s"SELECT max(id) FROM $t").head().getLong(0)
    // a replace keeps the identity contract AND the watermark
    Seq(("a", "new1")).toDF("grp", "payload").createOrReplaceTempView("ident_repl")
    spark.sql(s"INSERT OVERWRITE $t (grp, payload) SELECT grp, payload FROM ident_repl")
    val afterReplace = ids(dir)
    assert(afterReplace.size === 1 && afterReplace.head > oldMax,
      s"replace must keep numbering above history, got $afterReplace (old max $oldMax)")
    // DELETE + re-insert also stays above
    spark.sql(s"DELETE FROM $t WHERE true")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'new2')")
    assert(ids(dir).head > afterReplace.head)
  }

  test("refusals: supplied values, upsert/merge/overwrite, UPDATE SET, widen, late declare, BY DEFAULT") {
    import spark.implicits._
    val dir = freshDir("ident-refuse")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'p1')")
    def refuses(body: => Any, needle: String): Unit = {
      val e = intercept[Exception](body)
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"expected '$needle' in: ${e.getMessage.take(220)}")
    }
    refuses(spark.sql(s"INSERT INTO $t (grp, id, payload) VALUES ('a', 9, 'x')"),
      "IDENTITY")
    refuses(ManifestLake.write(spark,
      Seq(("a", 9L, "x")).toDF("grp", "id", "payload"), dir, Seq("grp"),
      replace = false), "omit")
    refuses(ManifestLake.upsert(spark, dir,
      Seq(("a", 1L, "x")).toDF("grp", "id", "payload"), Seq("grp"),
      Seq("grp", "id")), "IDENTITY")
    refuses(spark.sql(s"MERGE INTO $t x USING (SELECT 'a' AS grp, 'm' AS payload) s " +
      "ON x.grp = s.grp WHEN MATCHED THEN UPDATE SET payload = s.payload"),
      "IDENTITY")
    refuses(ManifestLake.overwritePartitions(spark, dir,
      Seq(("a", 9L, "x")).toDF("grp", "id", "payload")), "IDENTITY")
    refuses(spark.sql(s"UPDATE $t SET id = 99 WHERE true"), "IDENTITY")
    refuses(spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE DECIMAL(20,0)"),
      "IDENTITY")
    refuses(spark.sql(s"ALTER TABLE $t ALTER COLUMN id SET DEFAULT 5"),
      "IDENTITY")
    // declaring a non-BIGINT column refuses
    refuses(ManifestLake.declareIdentity(spark, dir, "payload"), "BIGINT")
  }

  test("GENERATED BY DEFAULT: supplied values pass through, omitted assign, watermark clears both") {
    val dir = freshDir("ident-bydef")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT BY 5), " +
      "payload STRING) USING `graft-manifest` PARTITIONED BY (grp)")
    val ddl = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(ddl.contains(
      "GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT BY 5)"), ddl)
    // omitted → engine assigns from the lattice
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'e1'), ('a', 'e2')")
    // supplied → values pass through unchanged (even OFF the lattice)
    spark.sql(s"INSERT INTO $t (grp, id, payload) VALUES ('a', 1003, 's1')")
    assert(spark.sql(s"SELECT id FROM $t WHERE payload = 's1'")
      .head().getLong(0) === 1003L)
    // positional arity INCLUDES a BY DEFAULT identity (standard SQL)
    spark.sql(s"INSERT INTO $t VALUES ('a', 2000, 's2')")
    // an explicit NULL stays NULL (supplied values pass through)
    spark.sql(s"INSERT INTO $t (grp, id, payload) VALUES ('a', NULL, 'sn')")
    assert(spark.sql(s"SELECT id FROM $t WHERE payload = 'sn'").head().isNullAt(0))
    // later engine assignments clear every supplied value AND stay on
    // the start/step lattice
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'e3')")
    val e3 = spark.sql(s"SELECT id FROM $t WHERE payload = 'e3'").head().getLong(0)
    assert(e3 > 2000L && (e3 - 10) % 5 === 0,
      s"post-supplied assignment must clear 2000 on the lattice, got $e3")
    val nonNull = spark.sql(s"SELECT id FROM $t WHERE id IS NOT NULL")
      .collect().map(_.getLong(0)).toSeq
    assert(nonNull.distinct.size === nonNull.size, s"no collisions: $nonNull")
  }

  test("declare-on-nonempty seeds the watermark above the existing column max") {
    import spark.implicits._
    val dir = freshDir("ident-migrate")
    val t = s"`graft-manifest`.`$dir`"
    // a migrated table with EXISTING keys (and one null) — no stats
    ManifestLake.write(spark,
      Seq(("a", Some(7L), "m1"), ("b", Some(92L), "m2"), ("a", None, "m3"))
        .toDF("grp", "id", "payload"), dir, Seq("grp"))
    ManifestLake.declareIdentity(spark, dir, "id", start = 1L, step = 3L,
      byDefault = true)
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'new1'), ('b', 'new2')")
    val got = spark.sql(s"SELECT payload, id FROM $t WHERE id IS NOT NULL")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("m1") === 7L && got("m2") === 92L,
      "existing keys must stay untouched")
    val fresh = Seq(got("new1"), got("new2"))
    assert(fresh.forall(v => v > 92L && (v - 1) % 3 == 0),
      s"new assignments must clear the existing max on the lattice: $fresh")
    assert(spark.sql(s"SELECT id FROM $t WHERE payload = 'm3'").head().isNullAt(0),
      "existing NULLs stay NULL (no backfill)")
    // the seeded column is now sticky in stats: a second declare refuses
    val e = intercept[Exception](ManifestLake.declareIdentity(spark, dir, "id"))
    assert(e.getMessage.contains("already has an IDENTITY"))
  }

  test("RESTORE never rolls the watermark back: post-restore inserts stay unique vs all history") {
    import spark.implicits._
    val dir = freshDir("ident-restore")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'v2a'), ('a', 'v2b')")
    val v2 = ManifestLake.currentVersion(spark, dir).get
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'v3a'), ('a', 'v3b')")
    val allBefore = ids(dir).toSet
    ManifestLake.restore(spark, dir, v2)
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'post')")
    val postId = spark.sql(s"SELECT id FROM $t WHERE payload = 'post'")
      .head().getLong(0)
    assert(!allBefore.contains(postId),
      s"a post-restore insert must not reuse an id from readable history " +
        s"(got $postId, history $allBefore)")
  }

  test("RESTORE to a pre-declaration version carries the head's identity fact forward") {
    val dir = freshDir("ident-predecl")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, id BIGINT, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")          // v1: NO identity
    ManifestLake.declareIdentity(spark, dir, "id", start = 10L) // v2
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'p1'), ('a', 'p2')")
    val allBefore = ids(dir).toSet
    ManifestLake.restore(spark, dir, 1L)
    // the fact (and its watermark) must survive the restore — dropping
    // it would let a re-declare reuse ids still readable in history
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val head = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    assert(head.identity.exists(_._1 == "id"),
      "restore to a pre-declaration version must carry the head's identity fact")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'post')")
    val postId = spark.sql(s"SELECT id FROM $t WHERE payload = 'post'")
      .head().getLong(0)
    assert(!allBefore.contains(postId),
      s"post-restore ids must not collide with readable history: $postId in $allBefore")
  }

  test("CREATE refusals fire BEFORE the base write: no half-created table remains") {
    val dir = freshDir("ident-half")
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE `graft-manifest`.`$dir` (grp STRING, " +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
        "USING `graft-manifest` PARTITIONED BY (id)"))
    assert(e.getMessage.toLowerCase.contains("partition column"),
      e.getMessage.take(200))
    assert(ManifestLake.currentVersion(spark, dir).isEmpty,
      "an invalid IDENTITY declaration must leave no half-created table")
  }

  test("named-catalog spelling: CREATE with IDENTITY + DEFAULT, insert by name") {
    val wh = java.nio.file.Files.createTempDirectory("ident-wh").toString
    spark.conf.set("spark.sql.catalog.gident", "graft.etl.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gident.warehouse", wh)
    spark.sql("CREATE TABLE gident.ns.t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "state STRING DEFAULT 'new', payload STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gident.ns.t (grp, payload) VALUES ('a', 'p1'), ('a', 'p2')")
    val rows = spark.sql("SELECT id, state, payload FROM gident.ns.t ORDER BY payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.map(_._2).toSeq === Seq("new", "new"))
    assert(rows.map(_._1).distinct.length === 2, "identity assigned uniquely by name")
    val ddl = spark.sql("SHOW CREATE TABLE gident.ns.t").head().getString(0)
    assert(ddl.contains("IDENTITY") && ddl.contains("DEFAULT 'new'"))
  }

  test("rename carries the fact; a shallow clone continues numbering above the source") {
    import spark.implicits._
    val dir = freshDir("ident-schema")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, " +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, payload STRING) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'p1'), ('a', 'p2')")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO row_id")
    spark.sql(s"INSERT INTO $t (grp, payload) VALUES ('a', 'p3')")
    val got = ManifestLake.read(spark, dir).select("row_id").as[Long]
      .collect().toSeq
    assert(got.distinct.size === 3, s"renamed identity keeps assigning: $got")
    // a clone carries the fact + watermark: its own inserts stay unique
    // against the cloned rows
    val clone = freshDir("ident-clone")
    ManifestLake.shallowClone(spark, dir, clone)
    spark.sql(s"INSERT INTO `graft-manifest`.`$clone` (grp, payload) VALUES ('a', 'c1')")
    val cloneIds = ManifestLake.read(spark, clone).select("row_id").as[Long]
      .collect().toSeq
    assert(cloneIds.distinct.size === 4,
      s"clone-side inserts must not collide with cloned values: $cloneIds")
  }
}
