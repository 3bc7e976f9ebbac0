package graft.pipeline

/**
 * Fixture inputs reproducing the reference's golden outputs
 * (SURVEY.md §5: notebook cell-4 row + the 3-row us_cities lookup,
 * reference codes/us_cities.csv:1-4, codes/RDS_Postgres_testing.ipynb).
 *
 * The OWM payload is constructed so the pipeline yields the exact golden
 * weather row: Houston, clear sky, 55.148 °F (= 286.01 K), feels-like
 * 53.654 (285.18 K), min 50.198 (283.26 K), max 57.11 (287.1 K),
 * pressure 1024, humidity 70, wind 0.0, time_of_record
 * 2025-03-17 04:31:08 local (epoch 1742203868, tz offset -18000).
 */
object Fixtures {

  val owmHoustonJson: String =
    """{"coord":{"lon":-95.3633,"lat":29.7633},
      |"weather":[{"id":800,"main":"Clear","description":"clear sky","icon":"01n"}],
      |"base":"stations",
      |"main":{"temp":286.01,"feels_like":285.18,"temp_min":283.26,"temp_max":287.1,"pressure":1024,"humidity":70,"sea_level":1024,"grnd_level":1022},
      |"visibility":10000,
      |"wind":{"speed":0.0,"deg":0},
      |"clouds":{"all":0},
      |"dt":1742203868,
      |"sys":{"type":1,"id":2001415,"country":"US","sunrise":1742214515,"sunset":1742257853},
      |"timezone":-18000,
      |"id":4699066,
      |"name":"Houston",
      |"cod":200}""".stripMargin.replace("\n", "")

  /**
   * us_cities.csv content, faithful to the reference fixture's quirks:
   * UTF-8 BOM on line 1 and header casing (`land_Area_sq_mile_2020`)
   * that does NOT match the target column name — exercising positional
   * binding (SURVEY.md §1.2).
   */
  val usCitiesCsv: String =
    "﻿city,state,census_2020,land_Area_sq_mile_2020\n" +
    "Chicago,Illinois,2746388,227.4\n" +
    "Seattle,Washington,737015,83.8\n" +
    "Houston,Texas,2304580,640.4\n"

  /** Write the CSV fixture to a temp location and return its path. */
  def writeUsCitiesCsv(dir: java.nio.file.Path): String = {
    val p = dir.resolve("us_cities.csv")
    java.nio.file.Files.write(p, usCitiesCsv.getBytes("UTF-8"))
    p.toString
  }
}
