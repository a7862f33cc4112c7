package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the four public annotation datasets, each normalized to
  * `(chrom, pos[, ref, alt]) + payload` so the pipeline joins are plain
  * equi-joins on one consistent key type (`pos: int` — the reference
  * joined int against string/long and leaned on Spark 2.4's implicit
  * coercion; under ANSI Spark 4 we coerce explicitly, SURVEY §7).
  *
  * Behavior reference: ImportVcfToDataLakeByRanges.java:48-50 (impact),
  * :159-199 (dbSNP), :236-267 (gnomAD), :201-234 (AlphaMissense).
  */
object Annotations {

  // ---- chrom-from-filename derivations (file-provenance-as-data) ----

  private def fileStem(c: Column): Column =
    substring_index(element_at(split(c, "/"), -1), ".", 1)

  /** `c1_m132.parquet` → `chr1`, `cY_m9.parquet` → `chrY`: token before
    * the first `_`, with EVERY `c` character removed (M:172-180 — the
    * regexp_replace("c","") quirk is preserved verbatim: a stem like
    * `abc_x` becomes `ab`).
    */
  private def chromFromRangedName: Column =
    concat(lit("chr"),
      upper(regexp_replace(substring_index(fileStem(input_file_name()), "_", 1), "c", "")))

  /** `1.parquet` → `chr1`, `X.parquet` → `chrX` (M:206-207). */
  private def chromFromPlainName: Column =
    concat(lit("chr"), upper(fileStem(input_file_name())))

  // ---- readers ----

  /** Clinical impact TSV (header `CHROM POS REF ALT IMPACT`). One row per
    * variant survives dropDuplicates (M:50; arbitrary survivor is fine —
    * duplicate rows across batches agree, asserted by the reference test
    * T:39-40). The trim of IMPACT happens here at the source rather than
    * post-join (M:60) — identical result, one fewer projection of the big
    * fact table.
    */
  def impact(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .select(
        concat(lit("chr"), upper(col("CHROM"))).as("chrom"),
        expr("try_cast(POS AS INT)").as("pos"),
        col("REF").as("ref"),
        col("ALT").as("alt"),
        trim(col("IMPACT")).as("impact"))
      .dropDuplicates("chrom", "pos", "ref", "alt")

  /** dbSNP rsIDs. TSV branch (hg19/hg38): positional columns, `#` header
    * filtered like VCF (M:188-195). Parquet branch (T2T): explicit schema
    * that deliberately omits the physically-conflicting CHROM column
    * (int64 in one file, string in another — M:163-170) and re-derives
    * chrom from the file name.
    */
  def dbSnp(spark: SparkSession, path: String, t2t: Boolean): DataFrame =
    if (t2t) {
      val schema = StructType(Seq(
        StructField("POS", LongType), StructField("REF", StringType),
        StructField("ALT", StringType), StructField("SNP", StringType)))
      spark.read.schema(schema).parquet(path)
        .select(
          chromFromRangedName.as("chrom"),
          col("POS").cast("int").as("pos"),
          col("REF").as("ref"),
          col("ALT").as("alt"),
          col("SNP").as("dbSNP"))
    } else {
      spark.read.option("sep", "\t").csv(path)
        .where(!col("_c0").like("#%"))
        .select(
          concat(lit("chr"), upper(col("_c0"))).as("chrom"),
          expr("try_cast(_c1 AS INT)").as("pos"),
          col("_c2").as("ref"),
          col("_c3").as("alt"),
          col("_c4").as("dbSNP"))
    }

  /** gnomAD v4 population allele counts. The explicit schema doubles as
    * column pruning AND schema tolerance: `hg38_coordinates` is declared
    * but physically absent from the fixture files — Spark fills the
    * column with nulls (M:238-248; behavior must be preserved).
    */
  def gnomad(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("POS", LongType), StructField("REF", StringType),
      StructField("ALT", StringType), StructField("gnomad_an", LongType),
      StructField("gnomad_ac", LongType), StructField("gnomad_nhomalt", LongType),
      StructField("hg38_coordinates", StringType)))
    spark.read.schema(schema).parquet(path)
      .select(
        chromFromRangedName.as("chrom"),
        col("POS").cast("int").as("pos"),
        col("REF").as("ref"),
        col("ALT").as("alt"),
        col("gnomad_an"), col("gnomad_ac"), col("gnomad_nhomalt"),
        col("hg38_coordinates").as("hg38_coordinate"))
  }

  private val bases = Seq("A", "C", "G", "T")

  /** AlphaMissense pathogenicity score, joined on `(chrom, pos)` ONLY
    * (M:210 — ref/alt matching is done post-join, quirk preserved).
    *
    * Alpha rows carry per-substitution score columns A/C/G/T where the
    * reference base's own column is 0; the decode selects `col(alt)` iff
    * `col(ref) == 0` — i.e. the row really describes this ref base — and
    * yields null for non-SNVs and mismatches. The reference spells this
    * as a hand-written 12-branch when-chain (M:212-228); here the chain
    * is generated by folding over the 12 (ref, alt) base pairs.
    */
  def attachAlpha(df: DataFrame, alphaPath: String): DataFrame = {
    val alphaRaw = df.sparkSession.read.parquet(alphaPath)
    // select-based projection: withColumn("pos") + drop("POS") would
    // interact badly under case-insensitive resolution (drop removes the
    // freshly-renamed column)
    val scoreCols = alphaRaw.columns.filterNot(_.equalsIgnoreCase("POS")).toSeq
    val alpha = alphaRaw.select(
      chromFromPlainName.as("chrom") +:
        col("POS").cast("int").as("pos") +:
        scoreCols.map(col): _*)
    val joined = df.join(alpha, Seq("chrom", "pos"), "left")
    val score = {
      val cases = for { r <- bases; a <- bases if a != r }
        yield (col("ref") === r && col(r) === 0 && col("alt") === a) -> col(a)
      cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
        case (chain, (cond, value)) => chain.when(cond, value)
      }
    }
    joined
      .withColumn("alphamissense", score)
      .select("alphamissense", df.columns: _*)
  }
}
