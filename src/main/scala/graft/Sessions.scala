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
      // AQE partition coalescing stays at the STOCK posture
      // (parallelismFirst=true, advisory 64 MB) — deliberately, and
      // re-measured this round (r19, guide §1.1 both directions).
      // parallelismFirst=false ("respect the advisory size", the
      // documented busy-cluster posture) was tried at advisory 8 MB
      // and 64 MB: matched-host BenchOne showed the streaming-loop
      // cells UNCHANGED (their sub-MB shuffles already coalesce to one
      // task under the stock 1 MB minPartitionSize floor) while the
      // CPU-dense small-byte cells paid real serialization —
      // basket_affinity 1.75 → 2.8 s, unpivot_long 2.1 → 3.2 s at
      // 64 MB (pair explosion / 240k-row sort collapsed to one task
      // whose per-row cost, not bytes, wants the cores). At cluster
      // scale the two postures converge (total/parallelism exceeds
      // the advisory long before 100 TB), so false buys nothing there
      // either. Full numbers in OPTIMIZATION_r19.md.
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
