package graft.etl

/** Locations of the genomic fixture inputs used by the ETL correctness
  * gate (SparkEntry q40-q43) and the ScalaTest pipeline specs.
  *
  * Two sources:
  *  - the reference's own checked-in test inputs (read-only), reused as
  *    behavior anchors — e.g. the hg19 batch whose lake output is the
  *    1622-row golden count (ImportVcfToDataLakeByRangesTest.java:37);
  *  - small parquet fixtures committed under `fixtures/` in THIS repo
  *    for the two datasets the reference's tests require but never
  *    committed (AlphaMissense per-chromosome parquet, T2T gnomAD) —
  *    generated deterministically by graft.etl.FixtureGen (test scope).
  *
  * Paths are absolute: the DuckDB oracle SQL for the gate queries must
  * embed the same literal paths, so both engines read identical bytes
  * regardless of working directory.
  */
object Fixtures {
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

  val repoFixtures = "/root/repo/fixtures"
  val alphaHg19 = s"$repoFixtures/alpha/hg-19"
  val alphaT2t = s"$repoFixtures/alpha/t2t"
  val gnomadT2t = s"$repoFixtures/gnomad/t2t"
}
