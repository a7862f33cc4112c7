package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Checked-in reference fixtures (read-only) + synthesis of the
  * datasets the reference tests require but never committed (FIXTURES.md
  * §6-7: AlphaMissense parquet per chromosome, T2T gnomAD parquet).
  * Fixtures also needed by the ETL correctness gate are committed under
  * `fixtures/` (see graft.etl.Fixtures + FixtureGen) and read from
  * there; synthesis remains only for test-local variants the gate
  * doesn't use (hg38 alpha).
  */
object GenomicFixtures {
  val refInput: String = Fixtures.refInput

  val hg19Vcfs = Fixtures.hg19Vcfs
  val hg38Vcfs = Fixtures.hg38Vcfs
  val t2tVcfs = Fixtures.t2tVcfs
  val hg19Impact = Fixtures.hg19Impact
  val hg38Impact = Fixtures.hg38Impact
  val t2tImpact = Fixtures.t2tImpact
  val hg19DbSnp = Fixtures.hg19DbSnp
  val hg38DbSnp = Fixtures.hg38DbSnp
  val t2tDbSnp = Fixtures.t2tDbSnp
  val gnomadHg38 = Fixtures.gnomadHg38

  def writeSingleParquet(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
                                 destDir: Path, fileName: String): Unit = {
    val tmp = Files.createTempDirectory("graft-fixture").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.createDirectories(destDir)
    Files.move(part, destDir.resolve(fileName), StandardCopyOption.REPLACE_EXISTING)
  }

  /** AlphaMissense: one file per chromosome named `<chrom>.parquet`, with
    * POS + per-base score columns where the ref base's own column is 0.
    * The chr1:11301714 row is crafted so the known A→G missense variant
    * decodes to score 0.92.
    */
  def synthesizeAlpha(spark: SparkSession, dir: String,
                      rows: Seq[(String, Long, Double, Double, Double, Double)]): String = {
    import spark.implicits._
    rows.groupBy(_._1).foreach { case (chrom, rs) =>
      val df = rs.map { case (_, p, a, c, g, t) => (p, a, c, g, t) }
        .toDF("POS", "A", "C", "G", "T")
      writeSingleParquet(spark, df, Paths.get(dir), s"$chrom.parquet")
    }
    dir
  }

}
