package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of one or more queries.
  * Usage: runMain graft.Explain <sfDir> <queryName> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // shared engine config ([[SessionDefaults]]) so printed plans come
    // from the same optimizer configuration Bench/Verify run (r18)
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
