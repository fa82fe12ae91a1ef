package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeatherCleanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val csvDir: String = {
    val dir = Files.createDirectories(
      java.nio.file.Paths.get("target/test-tmp/weather_csv")).toAbsolutePath.toString
    // headerless positional rows matching the 11-column schema
    val lines = Seq(
      "2024-02-01,5.1,1.25,9.0,0.4,0,180,3.2,7.7,1012.0,300",
      "2024-07-01,25.0,18.0,30.0,0.0,0,90,2.0,5.0,1015.0,600",  // outside Jan–Jun
      "2024-03-15,8.0,2.339,11.0,-1.0,1,200,4.0,8.0,1010.0,100",
      "2023-03-15,8.0,2.0,11.0,0.2,1,200,4.0,8.0,1010.0,100")   // wrong year
    Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      lines.mkString("\n").getBytes)
    dir
  }

  test("readWeather applies the explicit 11-column schema positionally (S3)") {
    val df = WeatherClean.readWeather(spark, csvDir)
    assert(df.schema == WeatherClean.weatherSchema)
    assert(df.count() == 4)
  }

  test("clean selects date/tmin/prcp, rounds to 2, filters the Jan–Jun window of the year") {
    val out = WeatherClean.clean(WeatherClean.readWeather(spark, csvDir), yr = 2024)
      .orderBy($"date")
    assert(out.columns.toSeq == Seq("date", "tmin", "prcp"))
    val rows = out.as[(java.sql.Date, Float, Float)].collect().toSeq
    assert(rows.map(_._1.toString) == Seq("2024-02-01", "2024-03-15"))
    assert(rows.map(_._2) == Seq(1.25f, 2.34f)) // round half-up to 2
  }

  test("audit aggregates: dateStats / nullCounts / invalidValues") {
    val cleaned = WeatherClean.clean(WeatherClean.readWeather(spark, csvDir), yr = 2024)
    val stats = WeatherClean.dateStats(cleaned).head()
    assert(stats.getLong(2) == 2)
    val nulls = WeatherClean.nullCounts(cleaned).head()
    assert((0 until 3).map(nulls.getLong).sum == 0)
    assert(WeatherClean.invalidValues(cleaned).head().getLong(0) == 1) // prcp = -1.0
  }

  test("write + readCleaned round-trips with the double upcast for the taxi join") {
    val path = "target/test-tmp/weather_clean_out"
    WeatherClean.write(WeatherClean.clean(WeatherClean.readWeather(spark, csvDir), 2024), path)
    val back = WeatherClean.readCleaned(spark, path)
    assert(back.schema("tmin").dataType.typeName == "double")
    assert(back.count() == 2)
  }
}
