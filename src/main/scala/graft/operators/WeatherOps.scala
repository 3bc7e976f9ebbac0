package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar transforms + flatten/projection for the weather pipeline
 * (SURVEY.md §2 ops 3-7). All built-in Column expressions — zero UDFs —
 * so everything stays inside whole-stage codegen and constant folding
 * applies (SURVEY.md §4.2).
 */
object WeatherOps {

  /**
   * Op 5 — Kelvin→Fahrenheit with round-to-3dp
   * (reference weather_etl_pipeline.py:47-48:
   * `round((t - 273.15) * 9/5 + 32, 3)`). Pure arithmetic, codegen'd;
   * Spark `round` is HALF_UP like Python's banker-free round on these
   * magnitudes.
   */
  def kelvinToFahrenheit(c: Column): Column =
    round((c - lit(273.15)) * lit(9.0) / lit(5.0) + lit(32.0), 3)

  /**
   * Op 6 — epoch seconds + UTC-offset → naive local timestamp
   * (reference weather_etl_pipeline.py:70-72:
   * `datetime.utcfromtimestamp(dt + timezone)`). The result is
   * local wall-clock stored tz-less; with the session timezone pinned to
   * UTC, `timestamp_seconds(epoch + offset)` reproduces it exactly
   * (SURVEY.md §1.2).
   */
  def localTimestamp(epochSeconds: Column, offsetSeconds: Column): Column =
    timestamp_seconds(epochSeconds + offsetSeconds)

  /**
   * Ops 3, 4, 7 — flatten the nested OWM payload into the 12-column
   * weather record (reference weather_etl_pipeline.py:60-73): nested
   * struct field access (`GetStructField`), array element [0] access
   * (`GetArrayItem`: weather_etl_pipeline.py:62), scalar conversions,
   * and the projection/rename that fixes the output schema.
   *
   * Input: one column `payload` of type Schemas.owmPayload.
   */
  def flattenOwm(df: DataFrame): DataFrame = {
    val p = col("payload")
    df.select(
      p.getField("name").as("city"),
      p.getField("weather").getItem(0).getField("description").as("description"),
      kelvinToFahrenheit(p.getField("main").getField("temp")).as("temperature_fahrenheit"),
      kelvinToFahrenheit(p.getField("main").getField("feels_like")).as("feels_like_fahrenheit"),
      kelvinToFahrenheit(p.getField("main").getField("temp_min")).as("min_temperature_fahrenheit"),
      kelvinToFahrenheit(p.getField("main").getField("temp_max")).as("max_temperature_fahrenheit"),
      p.getField("main").getField("pressure").as("pressure"),
      p.getField("main").getField("humidity").as("humidity"),
      p.getField("wind").getField("speed").as("wind_speed"),
      localTimestamp(p.getField("dt"), p.getField("timezone")).as("time_of_record"),
      localTimestamp(p.getField("sys").getField("sunrise"), p.getField("timezone")).as("sunrise"),
      localTimestamp(p.getField("sys").getField("sunset"), p.getField("timezone")).as("sunset"))
  }
}
