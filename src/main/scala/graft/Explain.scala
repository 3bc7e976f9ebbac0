package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of one or more queries.
  * Usage: runMain graft.Explain <sfDir> <queryName> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE coalescing targets bytes; text/similarity stages carry few MB
      // but heavy per-row CPU, so keep their exchanges parallel
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // shuffle/checkpoint scratch on tmpfs: the shared host's disk
      // stalls under neighbor I/O and parks executor threads
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
