package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` carries one entry per implemented operator from SURVEY.md §2
 * (instantiated on the harness tables) plus the north-star LLM-pipeline
 * operators; `oracleSql` has the DuckDB-equivalent SQL for every entry
 * that is SQL-expressible. Implementations live in [[Queries]] /
 * [[NorthStar]].
 */
object SparkEntry {

  /**
   * Flagship: the reference's core dataflow (JSON payload → flatten /
   * K→F / epoch→local-ts → broadcast lookup join → 15-col projection)
   * run end-to-end in memory on the golden fixtures, yielding the
   * reference's golden joined row (SURVEY.md §5). sfDir-independent by
   * design; the driver smoke-checks rows > 0.
   */
  def entry(spark: SparkSession): DataFrame = {
    import graft.model.Schemas
    import graft.operators.{Relational, WeatherOps}
    import graft.pipeline.Fixtures
    import graft.sources.Sources
    import org.apache.spark.sql.functions.col

    val payload = Sources.jsonDocuments(
      spark, Seq(Fixtures.owmHoustonJson), Schemas.owmPayload)
    val weather = WeatherOps.flattenOwm(payload)
    val tmp = java.nio.file.Files.createTempDirectory("graft_entry")
    val lookup = Sources.csvPositional(
      spark, Fixtures.writeUsCitiesCsv(tmp), Schemas.cityLookup)
    Relational.lookupJoin(weather, lookup, "city")
      .select(Schemas.finalWeatherCsvOrder.map(col): _*)
  }

  /** One entry per implemented operator from SURVEY.md §2 + north star. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-equivalent SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] = Queries.oracles
}
