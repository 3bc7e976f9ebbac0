package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.WeatherOps

/**
 * Scalar transform laws (SURVEY.md §5 property tests): K→F→K round trip,
 * epoch+offset naive-local timestamps, timestamp→CSV-string→timestamp.
 * ScalaCheck drives the generators; each property evaluates through a real
 * Spark projection (the library surface), not a reimplementation.
 */
class TransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("op 5: kelvinToFahrenheit matches the reference's rounding to 3 dp") {
    val out = Seq(286.01, 285.18, 283.26, 287.1).toDF("k")
      .select(WeatherOps.kelvinToFahrenheit(col("k"))).as[Double].collect()
    assert(out.toSeq == Seq(55.148, 53.654, 50.198, 57.11))
  }

  test("law: K→F→K round-trips within the 3-dp rounding budget") {
    // batch the generated samples through ONE Spark projection per check
    val ks = Gen.listOfN(50, Gen.choose(150.0, 350.0)).sample.get
    val fs = ks.toDF("k")
      .select(WeatherOps.kelvinToFahrenheit(col("k"))).as[Double].collect()
    ks.zip(fs).foreach { case (k, f) =>
      val kBack = (f - 32.0) * 5.0 / 9.0 + 273.15
      // round-to-3dp on F bounds the K error by 0.0005 · 5/9
      assert(math.abs(kBack - k) <= 5e-4, s"k=$k f=$f back=$kBack")
    }
  }

  test("op 6: epoch+offset yields the naive local wall-clock instant") {
    val ts = Seq((1742203868L, -18000L)).toDF("dt", "tz")
      .select(WeatherOps.localTimestamp(col("dt"), col("tz")))
      .as[java.sql.Timestamp].head()
    assert(ts.getTime == 1742185868000L) // 2025-03-17 04:31:08 Houston local
  }

  test("law: timestamp → CSV string → try_to_timestamp round-trips at second precision") {
    val epochs = Gen.listOfN(50, Gen.choose(0L, 4102444800L)).sample.get
    val back = epochs.toDF("e")
      .select(col("e"), try_to_timestamp(
        date_format(timestamp_seconds(col("e")), "yyyy-MM-dd HH:mm:ss")).as("ts"))
      .as[(Long, java.sql.Timestamp)].collect()
    back.foreach { case (e, ts) => assert(ts.getTime == e * 1000L, s"epoch=$e") }
  }

  test("law (scalacheck prop): epoch+offset timestamp equals epoch arithmetic") {
    val gen = for {
      dt <- Gen.choose(0L, 4102444800L)
      tz <- Gen.choose(-43200L, 50400L)
    } yield (dt, tz)
    check(Prop.forAll(gen) { case (dt, tz) =>
      val ts = Seq((dt, tz)).toDF("dt", "tz")
        .select(WeatherOps.localTimestamp(col("dt"), col("tz")))
        .as[java.sql.Timestamp].head()
      ts.getTime == (dt + tz) * 1000L
    }, n = 10)
  }

  test("op 15 semantics: try_to_timestamp nulls what ANSI to_timestamp would throw on") {
    val out = Seq("2025-03-17 04:31:08", "bad-O", "").toDF("s")
      .select(try_to_timestamp(col("s")).as("ts")).collect()
    assert(out(0).getTimestamp(0) != null)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }
}
