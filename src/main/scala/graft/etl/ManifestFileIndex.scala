package graft.etl

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] fed ENTIRELY from a [[ManifestLake]] manifest — the
  * piece that makes "the manifest IS the listing" true for scan
  * planning too. Where the default file index lists directories (one
  * RPC storm per query over a 720k-leaf lake) and INFERS partition
  * values from what it found, this index already knows every live
  * file, its size, and its partition values: planning a scan costs
  * zero filesystem calls, the plan holds exactly ONE scan node no
  * matter how many commits produced the files, and partition values
  * are typed by the RECORDED table schema instead of per-directory
  * inference (so a `lang=` that looks numeric in v1 and alphanumeric
  * in v2 cannot drift types between commits).
  *
  * Partition pruning happens where Spark expects it: [[listFiles]]
  * receives the partition-column predicates and evaluates them against
  * each partition's typed values, so `WHERE lang = 'en'` never plans
  * the other partitions' files — same contract as catalog partition
  * pruning, minus the catalog.
  *
  * Files are grouped by the hive `k=v` segments of their
  * manifest-relative path (`data/v<N>/k1=v1/.../file.parquet` — the
  * per-commit `v<N>` segment is NOT a partition level, which is why
  * the default discovery's "conflicting directory structures" check
  * can never accept this layout and a manifest-aware index is the
  * right mechanism, not a workaround).
  */
private[etl] final class ManifestFileIndex(
    spark: SparkSession,
    root: Path,
    partSchema: StructType,
    files: Seq[(String, FileStatus)]) // (manifest-relative path, status)
  extends FileIndex {

  private val zone = Option(spark.sessionState.conf.sessionLocalTimeZone)

  /** `k=v` dir segments of a manifest-relative path (between the
    * `data/v<N>/` prefix and the file name), value unescaped, the hive
    * null sentinel mapped to null.
    */
  private def partValuesOf(rel: String): Map[String, String] = {
    val segs = rel.split("/")
    segs.slice(2, segs.length - 1).iterator.map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"manifest data path has a non-hive partition segment: $rel")
      ExternalCatalogUtils.unescapePathName(seg.substring(0, i)) ->
        ExternalCatalogUtils.unescapePathName(seg.substring(i + 1))
    }.toMap
  }

  /** One entry per live partition: the typed values row plus its files.
    * Built once, in memory, from the manifest alone.
    */
  private val partitions: Seq[(InternalRow, Array[FileStatus])] =
    if (partSchema.isEmpty) {
      Seq((InternalRow.empty, files.map(_._2).toArray))
    } else {
      files
        .groupBy { case (rel, _) => partSchema.fieldNames.toSeq.map(partValuesOf(rel).apply) }
        .toSeq.sortBy(_._1.mkString("/"))
        .map { case (raw, fls) =>
          val typed = partSchema.fields.zip(raw).map { case (f, s) =>
            if (s == null || s == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
            else Cast(Literal(UTF8String.fromString(s), StringType), f.dataType, zone).eval(null)
          }
          (InternalRow.fromSeq(typed.toSeq), fls.map(_._2).toArray)
        }
    }

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = partSchema

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pruned =
      if (partitionFilters.isEmpty || partSchema.isEmpty) partitions
      else {
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partSchema.fieldIndex(a.name)
            BoundReference(i, partSchema(i).dataType, nullable = true)
        }
        val pred = Predicate.createInterpreted(bound)
        partitions.filter { case (values, _) => pred.eval(values) }
      }
    pruned.map { case (values, fls) => PartitionDirectory(values, fls) }
  }

  override def inputFiles: Array[String] =
    files.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._2.getLen).sum
}
