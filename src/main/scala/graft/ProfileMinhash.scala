package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = Tables.documents(spark, dir)
    t("explode_only") { docs.select(col("doc_id"), explode(TextOps.charShingles(col("text"), 8)).as("sh")).count() }
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 8)
    t("shingleSet_distinct") { sh.count() }
    val sig = Dedup.minhashSignature(sh, "doc_id", 8)
    t("signature") { sig.count() }
    val sigP = sig.persist(); sigP.count()
    val bands = Dedup.lshBands(sigP, "doc_id", 8, 2)
    t("bands") { bands.count() }
    t("candidatePairs") { Dedup.candidatePairs(bands, "doc_id").count() }
    spark.stop()
  }
}
