package graft.etl

import org.apache.spark.sql.SparkSession

/** spark-submit entry point — same 8 positional args as the reference
  * (ImportVcfToDataLakeByRanges.java:22-41) for drop-in compatibility:
  *
  *   input output status impact dbSNP t2t gnomAD alpha
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 8,
      "usage: <inputPath> <outputPath> <statusPath> <impactPath> <dbSnpPath> <t2t> <gnomadPath> <alphaPath>")
    val Array(inputPath, outputPath, statusPath, impactPath,
      dbSnpPath, t2tFlag, gnomadPath, alphaPath) = args

    // spark-submit injects spark.master as a system property; default to
    // local[*] so the same jar runs standalone (e.g. sbt runMain).
    val spark = SparkSession.builder().appName("graft-etl")
      .config("spark.master", sys.props.getOrElse("spark.master", "local[*]"))
      .getOrCreate()

    val lake = Lake.build(spark, inputPath, impactPath, dbSnpPath,
      t2tFlag.toBoolean, gnomadPath, alphaPath)
    Lake.write(lake, outputPath)
    Lake.writeStatus(Vcf.status(spark, inputPath), statusPath)
  }
}
