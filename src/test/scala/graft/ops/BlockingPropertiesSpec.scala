package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the two blocking kernels added in this round —
  * seeded ScalaCheck corpora, the REAL operators, brute-force /
  * declarative oracles asserted row-for-row.
  */
class BlockingPropertiesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(4242L)).get

  test("deletion_hashes equals the HOF neighborhood's xxhash64 set on random unicode strings") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // mixed-script generator: ASCII, accented latin, CJK, emoji-adjacent
    // surrogates, repeats — the shapes that break byte-level deletion
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (2, Gen.oneOf('é', 'ü', 'ß', 'ñ', 'ø')),
      (2, Gen.oneOf('日', '本', '語', '漢', '字')),
      (1, Gen.const('a'))) // extra repeats → duplicate variants
    val strGen = for {
      n <- Gen.chooseNum(0, 24)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val strings = sample(Gen.listOfN(120, strGen)).distinct
    val df = strings.toDF("s")
    for (d <- Seq(1, 2)) {
      val native = df.select(col("s"),
        graft.functions.GraftFunctions.deletion_hashes(col("s"), d).as("h"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
      val hood =
        if (d == 1) FuzzyJoin.deletionVariants(col("s"))
        else FuzzyJoin.deletionVariants2(col("s"))
      val oracle = df.select(col("s"), transform(hood, v => xxhash64(v)).as("h"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
      val diff = strings.filter(s => native(s) != oracle(s))
      assert(diff.isEmpty, s"depth $d mismatch on: ${diff.take(5)}")
    }
  }

  test("simhashPairs equals brute force on random sketches across widths and thresholds") {
    import spark.implicits._
    for ((bits, k) <- Seq((16, 2), (16, 5), (24, 3), (32, 7))) {
      val skGen = Gen.listOfN(bits, Gen.oneOf('0', '1')).map(_.mkString)
      val sketches = sample(Gen.listOfN(60, skGen)).distinct.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val df = sketches.toDF("doc_id", "simhash")
      val got = Dedup.simhashPairs(df, "doc_id", bits, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
      val brute = (for {
        (sa, a) <- sketches.map(_.swap); (sb, b) <- sketches.map(_.swap)
        if a < b
        d = sa.zip(sb).count { case (x, y) => x != y }
        if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got === brute, s"bits=$bits k=$k")
    }
  }
}
