package graft.etl

import java.nio.file.Paths

/** One-shot generator for the parquet fixtures committed under
  * `fixtures/` — the two datasets the reference's tests require but
  * never committed (FIXTURES.md §6-7). Output is deterministic, so
  * re-running reproduces the committed bytes' content (row-for-row).
  *
  * Run: sbt "Test/runMain graft.etl.FixtureGen"
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import GenomicFixtures.writeSingleParquet

    // AlphaMissense T2T: chr1:805837 is C→A in SRR581526-small.vcf; the
    // C column is 0 so the decode selects column A (= 0.1) for that
    // variant — giving the T2T gate query a non-null alphamissense.
    writeSingleParquet(spark,
      Seq((805837L, 0.1, 0.0, 0.3, 0.4)).toDF("POS", "A", "C", "G", "T"),
      Paths.get(Fixtures.alphaT2t), "1.parquet")

    // T2T gnomAD: same reader schema as hg38 gnomAD but WITHOUT
    // hg38_coordinates — exercising declared-but-absent-column
    // tolerance. Alleles match real SRR581526-small.vcf variants so the
    // (chrom,pos,ref,alt) join annotates.
    writeSingleParquet(spark,
      Seq(
        (805837L, "C", "A", 1000L, 42L, 3L),
        (730107L, "T", "C", 2000L, 7L, 0L))
        .toDF("POS", "REF", "ALT", "gnomad_an", "gnomad_ac", "gnomad_nhomalt"),
      Paths.get(Fixtures.gnomadT2t), "c1_r1.parquet")

    spark.stop()
  }
}
