package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline tests over the reference's checked-in genomic
  * fixtures, keeping its golden anchors (1622 hg19 lake rows, impact
  * dedup at chr1:11301714, samples_num == 3) plus assertions the
  * reference left as TODOs: alpha decode value, partition pruning on the
  * lake layout, schema tolerance, T2T chrom-from-filename.
  */
class LakePipelineSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import GenomicFixtures._

  // Committed fixture (fixtures/alpha/hg-19, via FixtureGen's
  // predecessor): chr1:11301714 ref=A decodes alt=G → 0.92
  private lazy val alphaHg19 = Fixtures.alphaHg19

  private lazy val alphaHg38 = synthesizeAlpha(spark,
    Files.createTempDirectory("alpha38").toString,
    Seq(("1", 162778659L, 0.0, 0.2, 0.4, 0.6)))

  private lazy val alphaT2t = Fixtures.alphaT2t

  private lazy val hg19Lake = Lake.build(spark, hg19Vcfs, hg19Impact,
    hg19DbSnp, t2t = false, gnomadHg38, alphaHg19)

  test("hg19 pipeline matches the reference golden anchors") {
    assert(hg19Lake.count() === 1622)
    val at = hg19Lake.where("chrom = 'chr1' and pos = 11301714")
    val entries = at.select(col("entries")).collect()
    assert(entries.length === 1)
    // impact dedup: exactly one entry survives for the duplicated row
    assert(at.select(size(col("entries"))).collect()(0).getInt(0) === 1)
    val asText = at.select(col("entries").cast("string")).collect()(0).getString(0)
    assert(asText.contains("missense"))
    // alpha decode: ref=A alt=G at a row where A==0 selects column G
    assert(asText.contains("0.92"))
  }

  test("lake schema matches the reference output contract") {
    val fields = hg19Lake.schema.fieldNames.toSet
    assert(fields === Set("chrom", "pos_bucket", "pos", "entries"))
    val entryType = hg19Lake.schema("entries").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(entryType.fieldNames.toSeq === Seq("ref", "alt", "impact", "dbSNP",
      "gnomad_an", "gnomad_ac", "gnomad_nhomalt", "hg38_coordinate",
      "alphamissense", "hom", "het"))
  }

  test("lake write → read-back parity and partition-pruned point query") {
    val out = Files.createTempDirectory("lake19").toString
    Lake.write(hg19Lake, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 1622)

    val pointQuery = back.where("chrom = 'chr1' and pos = 11301714")
    assert(pointQuery.count() === 1)
    // the layout contract (E3): chrom predicate prunes partitions
    val plan = pointQuery.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("chrom"))
  }

  test("hg38 pipeline serves the downstream range query") {
    val lake38 = Lake.build(spark, hg38Vcfs, hg38Impact, hg38DbSnp,
      t2t = false, gnomadHg38, alphaHg38)
    val out = Files.createTempDirectory("lake38").toString
    Lake.write(lake38, out)
    val back = spark.read.parquet(out)
    assert(back.count() === lake38.count())
    val range = back.where("chrom = 'chr2' and pos >= 25234482 and pos <= 26501857")
    assert(range.count() > 0)
  }

  test("T2T branch: parquet dbSNP, chrom-from-filename, absent-column tolerance") {
    val lakeT2t = Lake.build(spark, t2tVcfs, t2tImpact, t2tDbSnp,
      t2t = true, Fixtures.gnomadT2t, alphaT2t)
    val out = Files.createTempDirectory("lakeT2T").toString
    Lake.write(lakeT2t, out)
    val back = spark.read.parquet(out)
    assert(back.count() === lakeT2t.count())
    assert(back.count() > 0)
    // T2T VCF chrom values survive; the synthesized gnomAD row annotates
    assert(back.where("chrom = 'chr1' and pos = 805837").count() === 1)
    // hg38_coordinate is declared-but-absent → must read as null, not fail
    val entry = back.where("chrom = 'chr1' and pos = 805837")
      .select(explode(col("entries")).as("e")).select("e.gnomad_an", "e.hg38_coordinate")
      .collect()
    assert(entry.exists(r => !r.isNullAt(0)))
    assert(entry.forall(_.isNullAt(1)))
  }

  test("typed facade reads the lake with full fidelity") {
    val out = Files.createTempDirectory("lakeTyped").toString
    Lake.write(hg19Lake, out)
    val typed = model.readLake(spark, out)
    assert(typed.count() === 1622)
    val at = typed.filter(p => p.chrom == "chr1" && p.pos == 11301714).collect()
    assert(at.length === 1)
    val entry = at(0).entries.head
    assert(entry.impact.contains("missense"))
    assert(entry.alphamissense.contains(0.92))
    assert(at(0).pos_bucket === 11301714L / Lake.PartitionSize)
    // evidence structs survive the round-trip typed
    assert((entry.hom ++ entry.het).forall(_.id.startsWith("SRR")))
  }

  test("dynamic partition overwrite replaces only the batch's partitions") {
    import spark.implicits._
    val out = Files.createTempDirectory("lakeDyn").toString
    def batch(chrom: String, pos: Int) = Seq((chrom, pos.toLong / Lake.PartitionSize, pos, "x"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
    Lake.write(batch("chr1", 100), out)
    Lake.write(batch("chr2", 200), out, dynamicOverwrite = true)
    val back = spark.read.parquet(out)
    // static overwrite would have wiped chr1; dynamic must keep it
    assert(back.select("chrom").as[String].collect().toSet === Set("chr1", "chr2"))
    // overwriting chr1's bucket replaces, not appends
    Lake.write(batch("chr1", 105), out, dynamicOverwrite = true)
    val after = spark.read.parquet(out).where("chrom = 'chr1'")
    assert(after.count() === 1)
    assert(after.select("pos").as[Int].collect().toSeq === Seq(105))
  }

  test("landing stage preserves rows and parse exactly (splittable ingest)") {
    val landing = Files.createTempDirectory("landing").toString + "/lines"
    Vcf.land(spark, hg19Vcfs, landing)
    val direct = Vcf.mutations(spark, hg19Vcfs)
    val landed = Vcf.mutationsFromLanding(spark, landing)
    assert(landed.count() === direct.count())
    // full content equality both directions
    assert(landed.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(landed).count() === 0)
  }

  test("status: exact distinct counts and sample provenance") {
    val status = Vcf.status(spark, hg19Vcfs)
    val row = status.collect()(0)
    assert(status.count() === 1)
    assert(row.getAs[Long]("samples_num") === 3)
    assert(row.getAs[Long]("coordinates_num") <= row.getAs[Long]("mutations_num"))
    assert(row.getAs[String]("update_date") != null)
  }

  test("status JSON write is an accumulating append log") {
    val status = Vcf.status(spark, hg19Vcfs)
    val out = Files.createTempDirectory("status").toString + "/log"
    Lake.writeStatus(status, out)
    Lake.writeStatus(status, out)
    val back = spark.read.json(out)
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("coordinates_num", "mutations_num",
      "samples_num", "update_date"))
  }
}
