package graft.etl

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed facade over the lake schema (SURVEY §1: the pipeline itself is
  * DataFrame-based for schema flexibility; the typed view exists at the
  * module boundary for consumers who want compile-time safety).
  *
  * Field names/types mirror the output contract exactly
  * (ImportVcfToDataLakeByRanges.java:64-78).
  */
object model {

  /** Per-sample genotype evidence. */
  final case class Evidence(id: String, qual: Option[Float], ad: Option[String])

  /** One allele + annotations at a position. */
  final case class Entry(
      ref: String,
      alt: String,
      impact: Option[String],
      dbSNP: Option[String],
      gnomad_an: Option[Long],
      gnomad_ac: Option[Long],
      gnomad_nhomalt: Option[Long],
      hg38_coordinate: Option[String],
      alphamissense: Option[Double],
      hom: Seq[Evidence],
      het: Seq[Evidence])

  /** One lake row: all alleles observed at a genomic position. */
  final case class PositionEntries(
      chrom: String,
      pos_bucket: Long,
      pos: Int,
      entries: Seq[Entry])

  /** Typed read of a written lake. */
  def readLake(spark: SparkSession, path: String): Dataset[PositionEntries] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("chrom", "pos_bucket", "pos", "entries")
      .as[PositionEntries]
  }
}
