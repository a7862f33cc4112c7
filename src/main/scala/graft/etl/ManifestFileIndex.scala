package graft.etl

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, Predicate}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] fed ENTIRELY from a [[ManifestLake]] manifest — the
  * piece that makes "the manifest IS the listing" true for scan
  * planning too. Where the default file index lists directories (one
  * RPC storm per query over a 720k-leaf lake) and INFERS partition
  * values from what it found, this index already knows every live
  * file, its size, its partition values, and (when the write collected
  * them) its per-column [min, max] stats: planning a scan costs zero
  * filesystem calls, the plan holds exactly ONE scan node no matter
  * how many commits produced the files, and partition values are typed
  * by the RECORDED table schema instead of per-directory inference (so
  * a `lang=` that looks numeric in v1 and alphanumeric in v2 cannot
  * drift types between commits).
  *
  * Pruning happens where Spark expects it, twice over:
  *   - PARTITION pruning: [[listFiles]] evaluates the partition-column
  *     predicates against each partition's typed values, so
  *     `WHERE lang = 'en'` never plans the other partitions' files;
  *   - FILE-LEVEL DATA SKIPPING: the data-column predicates are tested
  *     against each file's manifest [min, max] range, so
  *     `WHERE pos > x` on a range-clustered table drops whole files at
  *     PLANNING — before any parquet footer is even opened, one level
  *     above the row-group pruning the reader still applies to the
  *     files that survive. The check is strictly conservative: only a
  *     provably-impossible range skips, an absent stat keeps the file,
  *     and every unrecognized predicate shape keeps the file — stats
  *     can never change results, only costs.
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
    dataSchema: StructType,
    files: Seq[(ManifestLake.LiveFile, FileStatus)],
    bloomLoader: String => Map[(String, String), Array[Byte]] =
      _ => Map.empty,
    bloomCols: Set[String] = Set.empty,
    // generated PARTITION columns as (physical name, PHYSICAL-name SQL
    // expression, physical base column) — the inference seam
    // [[GraftGeneratedPartitionFilter]] reads to derive partition
    // predicates from base-column equality filters
    val genPartExprs: Seq[(String, String, String)] = Seq.empty)
  extends FileIndex {

  /** Sidecar loads memoized per index instance — one read per distinct
    * bloom sidecar per plan, the global cache behind the loader makes
    * repeat plans free.
    */
  private val bloomMemo =
    scala.collection.mutable.Map.empty[String, Map[(String, String), Array[Byte]]]

  private def bloomOf(f: ManifestLake.LiveFile,
                      name: String): Option[Array[Byte]] =
    f.bloom.flatMap(ref =>
      bloomMemo.getOrElseUpdate(ref, bloomLoader(ref)).get((f.path, name)))

  /** col = v could hold per the file's BLOOM — the high-cardinality
    * membership test value sets cannot record. Write-side rendering is
    * the row value cast to string; this renders the typed literal
    * through the same Cast, so bits match bit-for-bit. No bloom, no
    * entry, or an unrenderable value keep the file — sound. Only
    * columns in the manifest's CURRENTLY TRACKED bloom set are probed:
    * a per-file sidecar ref can outlive the tracking (e.g. a type
    * widening that changes the string rendering untracks the column
    * without touching refs), and probing a stale ref under a new
    * rendering would manufacture false negatives.
    */
  private def bloomMight(f: ManifestLake.LiveFile, name: String,
                         v: Any): Boolean =
    if (!bloomCols.contains(name)) true
    else bloomOf(f, name) match {
      case None => true
      case Some(bits) =>
        dataSchema.fields.find(_.name == name) match {
          case None => true
          case Some(field) =>
            val rendered = Cast(Literal(v, field.dataType), StringType, zone).eval(null)
            rendered == null ||
              graft.functions.BloomBits.mightContain(bits, rendered.toString)
        }
    }

  private val zone = Option(spark.sessionState.conf.sessionLocalTimeZone)

  /** `k=v` dir segments of a manifest-relative path, value unescaped,
    * the hive null sentinel mapped to null. Located by SHAPE (the
    * contiguous `k=v` run before the file name), not position:
    * engine-written files carry a `data/v<N>…/` prefix, ADOPTED files
    * (in-place conversion) sit directly under the root — both parse
    * here (commit-dir segments can never contain '=').
    */
  private def partValuesOf(rel: String): Map[String, String] = {
    val segs = rel.split("/")
    segs.dropRight(1).iterator.filter(_.contains('=')).map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"manifest data path has a non-hive partition segment: $rel")
      ExternalCatalogUtils.unescapePathName(seg.substring(0, i)) ->
        ExternalCatalogUtils.unescapePathName(seg.substring(i + 1))
    }.toMap
  }

  private def castString(s: String, dt: DataType): Any =
    Cast(Literal(UTF8String.fromString(s), StringType), dt, zone).eval(null)

  /** One entry per live partition: the typed values row plus its files
    * (with their manifest stats riding along for the skip check).
    * Built once, in memory, from the manifest alone.
    */
  private val partitions: Seq[(InternalRow, Seq[(ManifestLake.LiveFile, FileStatus)])] =
    if (partSchema.isEmpty) {
      Seq((InternalRow.empty, files))
    } else {
      files
        .groupBy { case (f, _) => partSchema.fieldNames.toSeq.map(partValuesOf(f.path).apply) }
        .toSeq.sortBy(_._1.mkString("/"))
        .map { case (raw, fls) =>
          val typed = partSchema.fields.zip(raw).map { case (f, s) =>
            if (s == null || s == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
            else castString(s, f.dataType)
          }
          (InternalRow.fromSeq(typed.toSeq), fls)
        }
    }

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = partSchema

  /** ±0.0 normalization for the skip check. The interpreted ordering is
    * a TOTAL order (-0.0 < 0.0, matching IEEE totalOrder) while SQL
    * comparison treats -0.0 == 0.0 — so a file whose recorded min/max
    * is -0.0 would wrongly skip for `col = 0.0` / `col >= 0.0` under
    * the raw ordering, silently dropping matching rows. Mapping every
    * zero to +0.0 on BOTH the bounds and the predicate literal makes
    * the two orders agree on every comparison the check performs (NaN
    * needs no fix-up: Spark's SQL comparison and the interpreted
    * ordering both place NaN above every value and equal to itself).
    * Delta normalizes ±0.0 in collected stats for the same reason;
    * doing it on the READ side also repairs manifests written before
    * this fix.
    */
  private def normZero(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case x => x
  }

  /** Typed [lo, hi] + ordering for a stats column of one file, or None
    * when the file carries no stat for it (keep).
    */
  private def bounds(f: ManifestLake.LiveFile,
                     name: String): Option[(Any, Any, Ordering[Any])] =
    for {
      (loS, hiS) <- f.stats.get(name)
      field <- dataSchema.fields.find(_.name == name)
      lo = normZero(castString(loS, field.dataType))
      hi = normZero(castString(hiS, field.dataType))
      if lo != null && hi != null
    } yield (lo, hi,
      TypeUtils.getInterpretedOrdering(field.dataType).asInstanceOf[Ordering[Any]])

  /** Conservative "could any row of this file match?" over a data
    * predicate. Unknown shapes, absent stats, and null literals all
    * answer true — skipping must be provable, never guessed.
    */
  private def mightMatch(f: ManifestLake.LiveFile, p: Expression): Boolean = p match {
    case And(l, r) => mightMatch(f, l) && mightMatch(f, r)
    case Or(l, r) => mightMatch(f, l) || mightMatch(f, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => eqMight(f, a.name, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => eqMight(f, a.name, v)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null => eqMight(f, a.name, v)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null => eqMight(f, a.name, v)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => cmpMight(f, a.name, v, hiAbove = true, strict = true)
    case GreaterThan(Literal(v, _), a: AttributeReference) => cmpMight(f, a.name, v, hiAbove = false, strict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMight(f, a.name, v, hiAbove = true, strict = false)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMight(f, a.name, v, hiAbove = false, strict = false)
    case LessThan(a: AttributeReference, Literal(v, _)) => cmpMight(f, a.name, v, hiAbove = false, strict = true)
    case LessThan(Literal(v, _), a: AttributeReference) => cmpMight(f, a.name, v, hiAbove = true, strict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMight(f, a.name, v, hiAbove = false, strict = false)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMight(f, a.name, v, hiAbove = true, strict = false)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => eqMight(f, a.name, v); case _ => true }
    case Not(EqualTo(a: AttributeReference, Literal(v, _))) => neqMight(f, a.name, v)
    case Not(EqualTo(Literal(v, _), a: AttributeReference)) => neqMight(f, a.name, v)
    case org.apache.spark.sql.catalyst.expressions.StartsWith(
      a: AttributeReference, Literal(p: UTF8String, StringType)) =>
      prefixMight(f, a.name, p)
    // null-count skips — the predicates min/max can never answer. A
    // recorded null count of 0 proves `IS NULL` matches nothing; a null
    // count equal to the file's row count proves the column is all-null
    // and `IS NOT NULL` matches nothing (this also drops 0-row files,
    // which match nothing under any predicate). Either stat absent →
    // keep, as everywhere.
    case IsNull(a: AttributeReference) =>
      f.nullCounts.get(a.name).forall(_ > 0)
    case IsNotNull(a: AttributeReference) =>
      !f.rows.exists(r => f.nullCounts.get(a.name).exists(_ >= r))
    case _ => true
  }

  /** col LIKE 'p%' could hold iff [lo, hi] intersects [p, nextPrefix(p)):
    * every matching string s satisfies p <= s < nextPrefix(p) in binary
    * order, so the file is provably out iff hi < p, or lo >= the
    * smallest string ABOVE all p-prefixed ones. nextPrefix increments
    * the last non-0xFF byte and truncates (the same construction
    * Spark's own ParquetFilters pushes StartsWith with); an all-0xFF
    * prefix has no upper bound and the lo side degrades to keep —
    * conservative, like every other shape here.
    */
  private def prefixMight(f: ManifestLake.LiveFile, name: String,
                          p: UTF8String): Boolean =
    bounds(f, name).forall { case (lo, hi, ord) =>
      val loOk = {
        val bytes = p.getBytes
        val i = bytes.lastIndexWhere(b => (b & 0xFF) != 0xFF)
        if (i < 0) true // no representable upper bound -> keep
        else {
          val up = java.util.Arrays.copyOf(bytes, i + 1)
          up(i) = (up(i) + 1).toByte
          ord.compare(lo, UTF8String.fromBytes(up)) < 0
        }
      }
      loOk && ord.compare(hi, p) >= 0
    } && valueSet(f, name).forall { case (vs, _) =>
      // complete value set: some member must actually carry the prefix
      vs.exists { case s: UTF8String => s.startsWith(p); case _ => true }
    }

  /** The file's recorded DISTINCT values for `name`, typed, with the
    * column's ordering — present only when the write proved the set
    * complete (≤ cap values, all short; see ManifestLake.SetCap). An
    * empty set is meaningful: the column is all-null in this file.
    */
  private def valueSet(f: ManifestLake.LiveFile,
                       name: String): Option[(Seq[Any], Ordering[Any])] =
    for {
      vs <- f.valueSets.get(name)
      field <- dataSchema.fields.find(_.name == name)
      typed = vs.map(castString(_, field.dataType))
      // a member that fails to re-type would leave the set INCOMPLETE —
      // an incomplete set can prove nothing; treat as unknown (keep)
      if !typed.contains(null)
    } yield (typed,
      TypeUtils.getInterpretedOrdering(field.dataType).asInstanceOf[Ordering[Any]])

  /** col = v could hold iff lo <= v <= hi — and, when the file carries
    * a complete value set, iff v is actually IN it (the categorical
    * kill shot: a wide [min, max] over a handful of enum values skips
    * nothing, the membership test skips everything else).
    */
  private def eqMight(f: ManifestLake.LiveFile, name: String, v0: Any): Boolean = {
    val v = normZero(v0)
    v == null || (bounds(f, name).forall { case (lo, hi, ord) =>
      ord.compare(v, lo) >= 0 && ord.compare(v, hi) <= 0
    } && valueSet(f, name).forall { case (vs, ord) =>
      vs.exists(m => ord.compare(m, v) == 0)
    } && bloomMight(f, name, v))
  }

  /** col != v could hold unless EVERY value is v (lo = hi = v, or the
    * recorded value set is exactly {v} — including the all-null file,
    * whose set is {}: no non-null value can satisfy !=). Nulls unseen
    * by min/max don't satisfy != either, so the skip stays sound.
    */
  private def neqMight(f: ManifestLake.LiveFile, name: String, v0: Any): Boolean = {
    val v = normZero(v0)
    v == null || (bounds(f, name).forall { case (lo, hi, ord) =>
      !(ord.compare(lo, v) == 0 && ord.compare(hi, v) == 0)
    } && valueSet(f, name).forall { case (vs, ord) =>
      vs.exists(m => ord.compare(m, v) != 0)
    })
  }

  /** hiAbove: predicate needs some value above `v` (col > v) — test the
    * file's hi; otherwise it needs some value below (col < v) — test lo.
    */
  private def cmpMight(f: ManifestLake.LiveFile, name: String, v0: Any,
                       hiAbove: Boolean, strict: Boolean): Boolean = {
    val v = normZero(v0)
    v == null || bounds(f, name).forall { case (lo, hi, ord) =>
      val c = if (hiAbove) ord.compare(hi, v) else -ord.compare(lo, v)
      if (strict) c > 0 else c >= 0
    }
  }

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
    pruned.map { case (values, fls) =>
      val surviving =
        if (dataFilters.isEmpty) fls
        else fls.filter { case (f, _) => dataFilters.forall(mightMatch(f, _)) }
      PartitionDirectory(values, surviving.map(_._2).toArray)
    }.filter(_.files.nonEmpty)
  }

  override def inputFiles: Array[String] =
    files.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._2.getLen).sum
}
