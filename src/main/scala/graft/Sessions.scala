package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory: every entry point (Verify, Bench, tests)
  * runs with the same semantics-affecting configs.
  *
  *  - UTC session time zone (cross-engine datetime parity, SURVEY.md §2.7)
  *  - nanosAsLong: the driver's events parquet is TIMESTAMP(NANOS), which
  *    Spark has no type for; scan as LONG and convert in [[Tables.events]]
  *  - shuffle.partitions sized to the local core count, not the 200
  *    default — at cluster scale this is the knob sized to input volume
  */
object Sessions {
  // One warehouse per JVM (getOrCreate ignores static confs on reuse
  // anyway), recursively removed on exit.
  private lazy val warehouseDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-warehouse")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(d.toFile)
    }))
    d.toString
  }

  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // Per-JVM warehouse: the in-memory catalog starts empty each run,
      // so a reused on-disk location would collide with CREATE TABLE.
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Snapshot tables are read as manifest-listed EXACT file paths;
      // above 32 paths the default would launch a parallel-listing JOB
      // per read — pure scheduling overhead on a local fs where a
      // driver-side getFileStatus sweep is microseconds. 512 keeps
      // every manifest-sized listing driver-side; a real object-store
      // deployment would tune this back down for its listing latency.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Core count from the env the driver exports, default 32 (local[32]). */
  def cpusFromEnv: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
}
