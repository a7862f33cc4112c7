package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the normalizers (SURVEY §5c): ScalaCheck generates
  * a random-but-seeded VCF corpus, the REAL ingest pipeline runs over it
  * on disk, and the invariants are asserted for every generated row.
  */
class NormalizationPropertiesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  private val bases = Gen.oneOf("A", "C", "G", "T")
  private val genotypes = Gen.oneOf("1/1", "0/1", "1/2", "2/2", "0/2")
  private val chroms = for {
    core <- Gen.oneOf((1 to 22).map(_.toString) ++ Seq("X", "Y", "Un"))
    suffix <- Gen.oneOf("", "_KI270442v1", "_random")
  } yield s"chr$core$suffix"

  private case class VcfRow(chrom: String, pos: Int, ref: String, alt: String,
                            qual: Float, gt: String, ad: String)

  private val rowGen = for {
    chrom <- chroms
    pos <- Gen.chooseNum(1, 250000000)
    ref <- bases
    alt <- bases
    qual <- Gen.chooseNum(0, 10000).map(_ / 10.0f)
    gt <- genotypes
    a <- Gen.chooseNum(0, 50); b <- Gen.chooseNum(0, 50)
  } yield VcfRow(chrom, pos, ref, alt, qual, gt, s"$a,$b")

  private lazy val rows = sample(Gen.listOfN(300, rowGen))

  private lazy val vcfDir = {
    val dir = Files.createTempDirectory("propvcf")
    val lines = Seq("##fileformat=VCFv4.2", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS") ++
      rows.map(r => s"${r.chrom}\t${r.pos}\t.\t${r.ref}\t${r.alt}\t${r.qual}\tPASS\tAC=1\tGT:AD:DP\t${r.gt}:${r.ad}:7")
    Files.write(Paths.get(dir.toString, "PROPSAMPLE.vcf"),
      String.join("\n", lines: _*).getBytes)
    dir
  }

  private lazy val parsed = Vcf.mutations(spark, vcfDir.toString).collect()

  test("header lines are dropped; every data row survives") {
    assert(parsed.length === rows.length)
  }

  test("chrom collapse: no alt-contig suffix survives") {
    assert(parsed.forall(!_.getAs[String]("chrom").contains("_")))
    // and the collapse keeps the token before '_'
    val expected = rows.map(_.chrom.split("_")(0)).sorted
    assert(parsed.map(_.getAs[String]("chrom")).sorted.toSeq === expected)
  }

  test("zygosity: hom evidence iff genotype starts with 1/1, never both") {
    val homCount = parsed.count(r => !r.isNullAt(r.fieldIndex("hom_ev")))
    val hetCount = parsed.count(r => !r.isNullAt(r.fieldIndex("het_ev")))
    assert(homCount === rows.count(_.gt.startsWith("1/1")))
    assert(homCount + hetCount === rows.length)
  }

  test("sample id derives from the file basename before the first dot") {
    val ids = parsed.map { r =>
      val ev = if (!r.isNullAt(r.fieldIndex("hom_ev"))) r.getStruct(r.fieldIndex("hom_ev"))
        else r.getStruct(r.fieldIndex("het_ev"))
      ev.getAs[String]("id")
    }
    assert(ids.toSet === Set("PROPSAMPLE"))
  }

  test("evidence carries qual and the AD token") {
    val byKey = rows.groupBy(r => (r.chrom.split("_")(0), r.pos, r.ref, r.alt))
    parsed.foreach { r =>
      val ev = if (!r.isNullAt(r.fieldIndex("hom_ev"))) r.getStruct(r.fieldIndex("hom_ev"))
        else r.getStruct(r.fieldIndex("het_ev"))
      val key = (r.getAs[String]("chrom"), r.getAs[Int]("pos"),
        r.getAs[String]("ref"), r.getAs[String]("alt"))
      val candidates = byKey(key)
      assert(candidates.exists(c => c.qual == ev.getAs[Float]("qual") && c.ad == ev.getAs[String]("ad")))
    }
  }

  test("pos bucketing invariant: pos ∈ [bucket*W, bucket*W + W)") {
    import spark.implicits._
    val posDf = rows.map(_.pos).toDF("pos")
      .withColumn("bucket", floor(col("pos") / lit(Lake.PartitionSize)))
    val violations = posDf.where(
      col("pos") < col("bucket") * Lake.PartitionSize ||
        col("pos") >= (col("bucket") + 1) * Lake.PartitionSize).count()
    assert(violations === 0)
  }

  test("literal csv(Dataset[String]) API parses identically to the from_csv path") {
    // The reference's exact API shape (S2): DataFrameReader.csv over a
    // Dataset of lines. Tokenization must match graft's from_csv
    // re-derivation column for column...
    import spark.implicits._
    val lines = spark.read.text(vcfDir.toString + "/*.vcf")
      .where(!col("value").like("#%")).as[String]
    val literal = spark.read.option("sep", "\t").csv(lines)
      .select(col("_c0"), col("_c1"), col("_c3"), col("_c4"), col("_c5"), col("_c9"))
    val derived = Vcf.raw(spark, vcfDir.toString + "/*.vcf")
      .select(col("chrom"), col("pos"), col("ref"), col("alt"), col("qual"), col("last"))
    assert(literal.exceptAll(derived).count() === 0)
    assert(derived.exceptAll(literal).count() === 0)
    // ...and the provenance the reference leaned on (M:87) does survive
    // this plan shape in Spark 4: the text FileScan stays beneath the
    // second reader, so input_file_name() still resolves. graft captures
    // src_file as a real column anyway — provenance by construction,
    // robust to upstreams where input_file_name() is undefined (cached
    // or shuffled datasets), instead of by plan-shape accident.
    val prov = spark.read.option("sep", "\t").csv(lines)
      .select(input_file_name()).distinct().as[String].collect()
    assert(prov.length === 1 && prov(0).endsWith("PROPSAMPLE.vcf"))
  }

  test("charShingles yields max(len-n+1, 1) shingles of width <= n") {
    import spark.implicits._
    val texts = sample(Gen.listOfN(100, Gen.alphaNumStr.map(_.take(30))))
    val df = texts.toDF("text")
      .select(col("text"), graft.ops.TextOps.charShingles(col("text"), 5).as("sh"))
      .collect()
    df.foreach { r =>
      val t = r.getString(0)
      val sh = r.getSeq[String](1)
      assert(sh.length === math.max(t.length - 4, 1))
      assert(sh.forall(_.length <= 5))
    }
  }

  test("malformed rows don't crash the pipeline (ANSI-safe ingest)") {
    val dir = Files.createTempDirectory("badvcf")
    val lines = Seq(
      "##header",
      "chr1\t100\t.\tA\tG\t50.0\tPASS\tx\tGT\t1/1:3,4:7",   // good
      "chr2\tNOTANUMBER\t.\tA\tG\tqual?\tPASS\tx\tGT\t0/1", // bad pos+qual
      "chr3\t300",                                          // truncated line
      "chr4\t400\t.\tC\tT\t.\tPASS\tx\tGT\t1/1")            // VCF missing-qual '.'
    Files.write(Paths.get(dir.toString, "BAD.vcf"),
      String.join("\n", lines: _*).getBytes)
    val out = Vcf.mutations(spark, dir.toString).collect()
    assert(out.length === 4)
    val byChrom = out.map(r => r.getAs[String]("chrom") -> r).toMap
    assert(byChrom("chr1").getAs[Int]("pos") === 100)
    assert(byChrom("chr2").isNullAt(byChrom("chr2").fieldIndex("pos")))
    assert(byChrom("chr3").isNullAt(byChrom("chr3").fieldIndex("pos")) ||
      byChrom("chr3").getAs[Int]("pos") === 300) // truncated: ref/alt null, pos parses
    // '.' QUAL must become null qual in the evidence struct, not throw
    val ev4 = byChrom("chr4").getStruct(byChrom("chr4").fieldIndex("hom_ev"))
    assert(ev4.isNullAt(ev4.fieldIndex("qual")))
  }

  test("native char_shingles equals the declarative HOF (incl. multibyte, empty)") {
    import spark.implicits._
    val texts = sample(Gen.listOfN(200, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.listOfN(10, Gen.oneOf("é", "汉", "a", "🙂", " ")).map(_.mkString),
      Gen.const(""), Gen.const("ab")))) // shorter than n
    val diff = texts.toDF("text")
      .select(
        graft.ops.TextOps.charShingles(col("text"), 8).as("native"),
        graft.ops.TextOps.charShinglesHof(col("text"), 8).as("hof"))
      .where(not(col("native") === col("hof")))
      .count()
    assert(diff === 0)
  }
}
