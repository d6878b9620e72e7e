package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (same semantics configs as the
  * Verify/Bench entry points — see [[Sessions]]). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Sessions.local("4")

  def fixture(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Read a streaming-loop state table whichever layout it landed in:
    * snapshot-committed dirs (the round-14 default) resolve their
    * pinned head manifest; legacy dirs read as plain parquet. */
  def readStateTable(dir: String): org.apache.spark.sql.DataFrame =
    if (graft.etl.SnapshotTable.currentSnapshot(spark, dir).nonEmpty)
      graft.etl.SnapshotTable.read(spark, dir)
    else spark.read.parquet(dir)

  override def afterAll(): Unit = {
    // One JVM-wide session across suites; do not stop between suites.
    super.afterAll()
  }
}
