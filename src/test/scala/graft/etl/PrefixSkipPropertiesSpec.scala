package graft.etl

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal, StartsWith}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the LIKE-prefix skip check: stats pruning must be
  * SOUND — a file containing any row that matches the prefix must
  * survive `listFiles`, for every corpus and every prefix, including
  * the shapes that break byte-level reasoning (multi-byte UTF-8 at the
  * increment boundary, prefixes equal to a bound, prefixes longer than
  * a bound). Silent row loss is the one failure mode file skipping
  * must never have, so this is checked against a brute-force oracle
  * over the actual file contents rather than spot cases.
  */
class PrefixSkipPropertiesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(777L)).get

  test("prefix skipping never drops a file holding a match (random unicode corpora)") {
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (2, Gen.oneOf('é', 'ü', 'ß', 'ñ', 'ø')),
      (2, Gen.oneOf('日', '本', '語', '漢', '字')),
      (1, Gen.const('~')), (1, Gen.const(' ')))
    val strGen = for {
      n <- Gen.chooseNum(0, 10)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val corpusGen = Gen.listOfN(60, strGen)
    val root = new Path("/synthetic")

    (0 until 30).foreach { round =>
      val corpus = sample(Gen.listOfN(30, corpusGen)).apply(round).distinct.sorted
      if (corpus.nonEmpty) {
        // chunk the sorted corpus into "files" of 5, stats = true min/max
        val fileContents = corpus.grouped(5).zipWithIndex.map { case (rows, i) =>
          val rel = f"data/v000001/part-$i%04d.parquet"
          (rel, rows)
        }.toList
        val files = fileContents.map { case (rel, rows) =>
          (ManifestLake.LiveFile(1L, rel, Map("k" -> ((rows.min, rows.max)))),
            new FileStatus(1L, false, 1, 1, 0L, new Path(root, rel)))
        }
        val index = new ManifestFileIndex(spark, root,
          new StructType(), new StructType().add("k", StringType), files)
        // prefixes: corpus-derived (guaranteed matches) and random
        val prefixes =
          corpus.take(8).flatMap(s => Seq(s, s.take(1), s.take(3))) ++
            sample(Gen.listOfN(8, strGen)) :+ ""
        prefixes.distinct.foreach { p =>
          val pred = StartsWith(AttributeReference("k", StringType)(),
            Literal(UTF8String.fromString(p), StringType))
          val survivors = index.listFiles(Seq.empty, Seq(pred))
            .flatMap(_.files.map(_.fileStatus.getPath.toString)).toSet
          fileContents.foreach { case (rel, rows) =>
            val hasMatch = rows.exists(_.startsWith(p))
            val kept = survivors.contains(new Path(root, rel).toString)
            assert(!hasMatch || kept,
              s"UNSOUND skip: file $rel holds a '$p'-prefixed row " +
                s"(${rows.filter(_.startsWith(p)).take(3)}) but was pruned")
          }
        }
      }
    }
  }
}
