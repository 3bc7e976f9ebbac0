package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.model.Schemas
import graft.pipeline.Fixtures
import graft.sinks.Sinks
import graft.sources.Sources

/**
 * Positional-vs-name column binding — the reference's subtlest semantic
 * (SURVEY.md §1.2): the CSV header has a BOM and casing that does NOT
 * match the target DDL (`land_Area_sq_mile_2020` vs
 * `land_area_sq_mile_2020`), and the warehouse DDL's column order differs
 * from the export order, bound by NAME.
 */
class BindingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("schema evolution: mergeSchema unions columns across parquet generations") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_evolve").toString + "/t"
    // generation 1: (id, v); generation 2 adds a column
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/g=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$root/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted.toSeq == Seq("g", "id", "score", "v"))
    val byId = merged.select(col("id"), col("score")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // old-generation rows surface the new column as NULL, not an error
    assert(byId == Map(1L -> None, 2L -> Some(9.5)))
  }

  test("op 9: csvPositional discards the BOM'd mismatched header and binds by position") {
    val path = Fixtures.writeUsCitiesCsv(Files.createTempDirectory("graft_bind"))
    val df = Sources.csvPositional(spark, path, Schemas.cityLookup)
    assert(df.columns.toSeq == Seq("city", "state", "census_2020", "land_area_sq_mile_2020"))
    val rows = df.orderBy(col("city")).collect()
    assert(rows.length == 3)
    val houston = rows.find(_.getString(0) == "Houston").get
    assert(houston.getString(1) == "Texas")
    assert(houston.getLong(2) == 2304580L)
    assert(houston.getDouble(3) == 640.4)
    // the BOM must not have leaked into the first data value
    assert(rows.head.getString(0).head.isLetter)
  }

  test("op 10: appendPositional imposes target names by position") {
    import spark.implicits._
    val src = Seq(("x", "y", 1L)).toDF("colA", "colB", "colC")
    val out = Files.createTempDirectory("graft_pos").toString + "/t"
    Sinks.appendPositional(src, Seq("c1", "c2", "c3"), out)
    assert(spark.read.parquet(out).columns.toSeq == Seq("c1", "c2", "c3"))
  }

  test("op 16: appendByName realigns a differently-ordered frame to the target DDL order") {
    import spark.implicits._
    val src = Seq((1L, "a", 2.0)).toDF("n", "s", "d")
    val out = Files.createTempDirectory("graft_name").toString + "/t"
    Sinks.appendByName(src, Seq("s", "d", "n"), out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Seq("s", "d", "n"))
    val r = back.collect().head
    assert(r.getString(0) == "a" && r.getDouble(1) == 2.0 && r.getLong(2) == 1L)
  }

  test("op 16: appendByName rejects mismatched column sets instead of silently nulling") {
    import spark.implicits._
    val src = Seq((1L, "a")).toDF("n", "s")
    intercept[IllegalArgumentException] {
      Sinks.appendByName(src, Seq("n", "missing"), "/tmp/never_written")
    }
  }

  test("op 1: probeAvailable retries then reports source state") {
    var calls = 0
    assert(Sources.probeAvailable(() => { calls += 1; calls >= 3 }, retries = 3, delayMs = 1))
    assert(calls == 3)
    assert(!Sources.probeAvailable(() => sys.error("down"), retries = 1, delayMs = 1))
  }

  test("op 15: csvWithTimestampCoercion nulls malformed timestamps (pd.to_datetime errors=coerce)") {
    val dir = Files.createTempDirectory("graft_coerce")
    val f = dir.resolve("t.csv")
    Files.write(f, "id,ts\n1,2025-03-17 04:31:08\n2,not-a-timestamp\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val df = Sources.csvWithTimestampCoercion(spark, f.toString, schema, Seq("ts"))
    val rows = df.orderBy(col("id")).collect()
    assert(rows(0).getTimestamp(1) != null)
    assert(rows(0).getTimestamp(1).getTime == 1742185868000L)
    assert(rows(1).isNullAt(1))
  }

  test("bucketed tables join co-located: sort-merge join with zero shuffle exchanges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fact = (1 to 2000).map(i => (i.toLong % 64, i.toLong)).toDF("k", "v")
    val dim = (0 to 63).map(k => (k.toLong, s"d$k")).toDF("k", "name")
    graft.sinks.Sinks.writeBucketed(fact, "bkt_fact", "k", 8)
    graft.sinks.Sinks.writeBucketed(dim, "bkt_dim", "k", 8)
    // merge hint pins SMJ (the sizes here would broadcast, which proves
    // nothing about bucketing); bucketed scans satisfy the required hash
    // distribution, so NO exchange appears on either side
    val joined = spark.table("bkt_fact").hint("merge")
      .join(spark.table("bkt_dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    val expected = fact.join(dim, "k").select(col("v"), col("name"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(joined.select(col("v"), col("name"))
      .as[(Long, String)].collect().sorted.toSeq == expected)
  }
}
