package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface lives in [[Queries]]; each entry pairs a Spark
  * plan with a DuckDB oracle where ANSI SQL can express it. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full market feature factory (§3.1 step 5): resample events to
    * OHLCV bars, compute all 11 v1 features per series. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all.find(_.name == "q_market_features").get.fn(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
