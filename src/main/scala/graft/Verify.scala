package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: only dump queries whose name starts with it
    // (local iteration aid; the driver always passes exactly two args)
    val only = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      // AQE's default 64MB coalesce target strangles reduce-side parallelism
      // at local data sizes; 4MB keeps all cores busy (no-op at real scale)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // local proxy for many-block tables at scale: without this the ~10MB
      // test parquet files become ONE scan partition and nothing parallelises
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(2 * 1024 * 1024))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // materialize the deterministic image+caption table once so the image
    // queries READ a stored table and the DuckDB oracles can query the very
    // same parquet files (path substituted for __IMGDIR__ below)
    val imgDir = graft.images.SyntheticImages
      .materialized(spark, SparkEntry.imageCount(sfDir))
    SparkEntry.queries.filter(kv => only.forall(kv._1.startsWith)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__IMGDIR__", imgDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
