package graft

import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/**
 * The real `df.write.jdbc` path for sink ops 8/10/16, round-tripped
 * in-process against embedded Derby (the JDBC engine shipped with the
 * Spark distribution) — the closest offline stand-in for the
 * reference's Postgres connection: a genuine JDBC DDL, INSERT binding
 * against it, and a read-back through both `spark.read.jdbc` and raw
 * JDBC.
 */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dbDir = {
    val root = java.nio.file.Files.createTempDirectory("graft_derby")
    // keep derby.log out of the repo working directory
    System.setProperty("derby.system.home", root.toString)
    s"$root/db"
  }
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private lazy val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def withStmt[T](body: java.sql.Statement => T): T = {
    val conn = DriverManager.getConnection(url)
    try body(conn.createStatement()) finally conn.close()
  }

  test("op 8: single-row JDBC append lands exactly one row, typed") {
    withStmt(_.execute(
      """CREATE TABLE weather_obs (
           city VARCHAR(64), temp_f DOUBLE, obs_ts TIMESTAMP)"""))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:30:00")
    Sinks.appendJdbc(Seq(("Lagos", 88.7, ts)).toDF("city", "temp_f", "obs_ts"),
      url, "weather_obs", props)
    val back = spark.read.jdbc(url, "weather_obs", props)
      .as[(String, Double, java.sql.Timestamp)].collect().toSeq
    assert(back == Seq(("Lagos", 88.7, ts)))
    // and a second append APPENDS (no truncate-on-write surprises)
    Sinks.appendJdbc(Seq(("Accra", 84.2, ts)).toDF("city", "temp_f", "obs_ts"),
      url, "weather_obs", props)
    assert(spark.read.jdbc(url, "weather_obs", props).count() == 2)
  }

  test("op 10: bulk append with POSITIONAL binding (source header names " +
       "ignored, target names imposed by position)") {
    withStmt(_.execute(
      "CREATE TABLE bulk_tgt (id INT, name VARCHAR(32), v DOUBLE)"))
    // source frame arrives with meaningless header names, like the
    // reference's CSV re-scan
    val src = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5))
      .toDF("c0", "c1", "c2")
    Sinks.appendJdbc(src.toDF("id", "name", "v"), url, "bulk_tgt", props)
    val back = spark.read.jdbc(url, "bulk_tgt", props)
      .orderBy(col("id")).as[(Int, String, Double)].collect().toSeq
    assert(back == Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)))
  }

  test("op 16: NAME binding against a DDL whose column order differs " +
       "from the DataFrame's") {
    withStmt(_.execute(
      "CREATE TABLE ddl_order (v DOUBLE, id INT, name VARCHAR(32))"))
    // DataFrame order (id, name, v) != DDL order (v, id, name): the JDBC
    // writer's INSERT carries an explicit column list, so values must
    // land in the right columns regardless
    Sinks.appendJdbc(Seq((7, "x", 9.25)).toDF("id", "name", "v"),
      url, "ddl_order", props)
    val viaJdbc = withStmt { st =>
      val rs = st.executeQuery("SELECT v, id, name FROM ddl_order")
      rs.next()
      (rs.getDouble(1), rs.getInt(2), rs.getString(3))
    }
    assert(viaJdbc == (9.25, 7, "x"))
  }
}
