package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator layer (SURVEY.md §2 ops 11-13, 18-21 + the §2.1
 * gap-ledger extensions: aggregation, sort/top-k, distinct, set ops,
 * window functions).
 *
 * Scale posture (100 TB): lookup joins broadcast the dimension side
 * explicitly; fact-fact joins rely on shuffle-hash/sort-merge with AQE;
 * top-k uses `sort.limit` which Spark executes as a per-partition
 * TakeOrdered (no global sort shuffle).
 */
object Relational {

  /**
   * Op 11 — inner equi-join fact ⋈ small dimension with projection.
   * The reference ships this join to Postgres
   * (weather_etl_pipeline.py:160-180); here it is a
   * BroadcastHashJoinExec — the dimension is broadcast so the fact side
   * never shuffles, which is the correct plan at any fact-table scale.
   */
  def lookupJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "inner")

  /**
   * SERIAL-id semantics (reference README.md:262 `SERIAL PRIMARY KEY`):
   * dense, deterministic ids assigned by position in a total order —
   * `row_number` over an explicit ordering, recomputed per read
   * (SURVEY.md §7.3#1). For scale: partition the window where a total
   * order isn't required.
   */
  def withSerialId(df: DataFrame, orderBy: Seq[Column], idCol: String = "id"): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(orderBy: _*)))

  /**
   * Scale-safe SERIAL ids: the unpartitioned window above funnels every
   * row through ONE task — fine for the reference's row-per-day table,
   * fatal at 100 TB. This variant range-partitions by the order keys,
   * sorts within partitions, and assigns ids as partition offset +
   * local index (one count pass + one zip pass, both fully parallel).
   * Ids are dense 1..n in the global orderBy order.
   */
  def withSerialIdDistributed(df: DataFrame, orderBy: Seq[Column],
                              idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderBy: _*).sortWithinPartitions(orderBy: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val withIdx = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(withIdx, schema)
  }

  /**
   * Top-k: ORDER BY ... LIMIT k. Spark plans this as
   * TakeOrderedAndProject — each partition keeps only k rows, the driver
   * merges; no global sort shuffle even at 100 TB.
   */
  def topK(df: DataFrame, k: Int, orderBy: Column*): DataFrame =
    df.orderBy(orderBy: _*).limit(k)

  /** Op 19 — truncate: overwrite the table path with an empty frame. */
  def truncate(df: DataFrame, path: String): Unit =
    df.limit(0).write.mode("overwrite").parquet(path)

  /**
   * Per-key top-k via the custom [[graft.plans.TopKPerKey]] operator:
   * per-partition bounded heaps (O(n log k), memory O(keys×k)) instead of
   * the window formulation's full partition sort + filter. Same output
   * SET as `row_number().over(partitionBy keys orderBy order) <= k` when
   * `order` is a total order. Registers the planner strategy on the
   * session if needed.
   */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, SortOrder}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    val child = GraftBridge.analyzed(df)
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute =>
        child.output.find(_.name == u.nameParts.last).getOrElse(
          throw new IllegalArgumentException(s"column ${u.name} not in ${child.output.map(_.name)}"))
    }
    val keyExprs: Seq[Expression] = keyCols.map(n =>
      child.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"key column $n not found")))
    val sortOrders = order.map(c => GraftBridge.catalystExpression(spark, c) match {
      case so: SortOrder => so.copy(child = resolve(so.child))
      case e => SortOrder(resolve(e), Ascending)
    })
    GraftBridge.ofRows(spark, graft.plans.TopKPerKey(keyExprs, sortOrders, k, child))
  }

  /**
   * Skew-resistant equi-join (the manual fallback when AQE's skew-join
   * split can't apply, e.g. broadcast-ineligible dims with one hot key):
   * the fact side gets a deterministic salt in [0, factor) hashed from
   * the full row, the dim side is replicated ×factor, and the join key
   * becomes (key, salt) — a hot key's rows spread over `factor` reducers
   * instead of one straggler task. Result set identical to a plain
   * inner join on `key`.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val sf = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(factor.toLong)).cast("int"))
    val sd = dim.withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
    sf.join(sd, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
