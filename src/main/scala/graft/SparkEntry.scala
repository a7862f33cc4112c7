package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions) to a DataFrame program over the synthetic
  * tables in a scale-factor directory; `oracleSql` carries the DuckDB
  * equivalent for the driver's hash-match correctness gate.
  */
object SparkEntry {

  private def packs: Seq[qp.Q] =
    qp.Relational.all ++ qp.LlmOps.all ++ qp.Corpus.all ++ qp.EtlGate.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    packs.find(_.name == "q4_join_multi").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
