package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway stage-by-stage profiler for the minhash family (not part
  * of the library; deleted after use).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val avgLen = docs.agg(avg(length(col("text")))).head().getDouble(0)
    println(s"PROFILE docs=$n avgLen=$avgLen")

    // warm JIT
    Dedup.shingleArrays(docs, "doc_id", "text", 8).count()

    val sets = time("shingleArrays materialize") {
      val s = Dedup.shingleArrays(docs, "doc_id", "text", 8).persist()
      s.count(); s
    }
    val totalShingles = sets.agg(sum(size(col("shs")))).head().getLong(0)
    println(s"PROFILE distinct (doc,shingle) rows = $totalShingles")

    val sig = time("signature from sets") {
      val s = Dedup.minhashSignature(
        sets.select(col("doc_id"), explode(col("shs")).as("sh")), "doc_id", 8).persist()
      s.count(); s
    }
    time("signature direct (q21 path)") {
      Dedup.minhashSignatureDirect(docs, "doc_id", "text", 8, 8).count()
    }
    val cand = time("candidatePairs") {
      val c = Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id", 8, 2), "doc_id",
        maxBucket = Some(32)).persist()
      println(s"PROFILE n_candidates = ${c.count()}")
      c
    }
    time("jaccardVerifySets") {
      Dedup.jaccardVerifySets(cand, sets, "doc_id", 0.2).count()
    }
    time("jaccardVerifySets run2") {
      Dedup.jaccardVerifySets(cand, sets, "doc_id", 0.2).count()
    }
    println("PLAN-CAND:")
    Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id", 8, 2), "doc_id",
      maxBucket = Some(32)).explain("formatted")
    spark.stop()
  }
}
