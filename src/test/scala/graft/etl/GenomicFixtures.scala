package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Checked-in reference fixtures (read-only) + synthesis of the two
  * datasets the reference tests require but never committed (FIXTURES.md
  * §6-7: AlphaMissense parquet per chromosome, T2T gnomAD parquet).
  */
object GenomicFixtures {
  val refInput = "/root/reference/src/test/resources/input"

  val hg19Vcfs = s"$refInput/*/hg19/"
  val hg38Vcfs = s"$refInput/*/hg38/"
  val t2tVcfs = s"$refInput/CHM13V2/batches/*/chm13v2.0/*"
  val hg19Impact = s"$refInput/*/Impact/impacts.hg19.csv"
  val hg38Impact = s"$refInput/*/Impact/impacts.hg38.csv"
  val t2tImpact = s"$refInput/CHM13V2/Impact/*"
  val hg19DbSnp = s"$refInput/dbSNP/dbSNP.hg19.tsv"
  val hg38DbSnp = s"$refInput/dbSNP/dbSNP.hg38.tsv"
  val t2tDbSnp = s"$refInput/CHM13V2/dbSNP/*"
  val gnomadHg38 = s"$refInput/gnomad/hg-38"

  private def writeSingleParquet(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
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

  /** T2T gnomAD: same reader as hg38 gnomAD (schema of FIXTURES.md §5)
    * but WITHOUT hg38_coordinates — exercising the declared-but-absent
    * column tolerance path.
    */
  def synthesizeT2tGnomad(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    // alleles match the real variants in SRR581526-small.vcf so the
    // (chrom,pos,ref,alt) join actually annotates
    val df = Seq(
      (805837L, "C", "A", 1000L, 42L, 3L),
      (730107L, "T", "C", 2000L, 7L, 0L))
      .toDF("POS", "REF", "ALT", "gnomad_an", "gnomad_ac", "gnomad_nhomalt")
    writeSingleParquet(spark, df, Paths.get(dir), "c1_r1.parquet")
    dir
  }
}
