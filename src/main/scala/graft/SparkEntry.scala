package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the registry of every implemented operator (SURVEY §2.2);
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against. Column names/aliases match pairwise by construction — the
  * driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.joinStarMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EtlQueries.queries ++ JoinQueries.queries ++
      AggWindowQueries.queries ++ SortSetQueries.queries ++
      ScalarQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ AdvancedQueries.queries ++
      SourceSinkQueries.queries ++ AsofQueries.queries ++
      RangeTfQueries.queries ++ CurationQueries.queries ++
      GraphQueries.queries ++ StatQueries.queries ++
      DecisionQueries.queries ++ DecisionQueriesB.queries ++
      FrontierQueries.queries ++ FrontierQueriesB.queries ++
      FrontierQueriesC.queries ++ FrontierQueriesD.queries ++
      FrontierQueriesE.queries ++ FrontierQueriesF.queries ++
      FrontierQueriesG.queries ++ FrontierQueriesH.queries ++
      FrontierQueriesI.queries ++ FrontierQueriesJ.queries ++
      FrontierQueriesK.queries ++ FrontierQueriesL.queries ++
      FrontierQueriesM.queries ++ FrontierQueriesN.queries ++
      FrontierQueriesO.queries ++ FrontierQueriesP.queries ++
      FrontierQueriesQ.queries ++ FrontierQueriesR.queries ++
      FrontierQueriesS.queries ++ FrontierQueriesT.queries ++
      FrontierQueriesU.queries ++ FrontierQueriesV.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ EtlQueries.oracle ++ JoinQueries.oracle ++
      AggWindowQueries.oracle ++ SortSetQueries.oracle ++
      ScalarQueries.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++
      MultimodalQueries.oracle ++ AdvancedQueries.oracle ++
      SourceSinkQueries.oracle ++ AsofQueries.oracle ++
      RangeTfQueries.oracle ++ CurationQueries.oracle ++
      GraphQueries.oracle ++ StatQueries.oracle ++
      DecisionQueries.oracle ++ DecisionQueriesB.oracle ++
      FrontierQueries.oracle ++ FrontierQueriesB.oracle ++
      FrontierQueriesC.oracle ++ FrontierQueriesD.oracle ++
      FrontierQueriesE.oracle ++ FrontierQueriesF.oracle ++
      FrontierQueriesG.oracle ++ FrontierQueriesH.oracle ++
      FrontierQueriesI.oracle ++ FrontierQueriesJ.oracle ++
      FrontierQueriesK.oracle ++ FrontierQueriesL.oracle ++
      FrontierQueriesM.oracle ++ FrontierQueriesN.oracle ++
      FrontierQueriesO.oracle ++ FrontierQueriesP.oracle ++
      FrontierQueriesQ.oracle ++ FrontierQueriesR.oracle ++
      FrontierQueriesS.oracle ++ FrontierQueriesT.oracle ++
      FrontierQueriesU.oracle ++ FrontierQueriesV.oracle
}
