package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The declared storage-layout queries must prove their plan shape, not
  * just their answers: join_bucketed plans with zero Exchange/Sort,
  * partition_prune's scan keeps the date predicate in PartitionFilters
  * and reads only the matching partition's files. */
class StorageQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("join_bucketed: sort-merge join with no Exchange, all buckets aligned") {
    val t = Tables(spark, sf)
    val plan = StorageQueries.bucketedJoin(t).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
    // A Sort remains above each scan: Spark 3+ no longer propagates the
    // written per-bucket sort order from bucketed scans (the sorted-scan
    // contract was retired with spark.sql.legacy.bucketedTableScan
    // .outputOrdering=false), so SMJ re-sorts — an O(n) pass over
    // already-sorted runs, while the eliminated Exchange was the
    // network-dominant cost. The write is still sorted: it compresses
    // better and gives min/max row-group pruning on the key.
  }

  test("join_bucketed result matches the plain unbucketed join") {
    val t = Tables(spark, sf)
    val bucketed = StorageQueries.bucketedJoin(t)
      .groupBy("o_orderpriority").count()
    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    assert(bucketed.orderBy("o_orderpriority").collect().toSeq ==
      plain.orderBy("o_orderpriority").collect().toSeq)
  }

  test("partition_prune: scan shows PartitionFilters and reads 1 partition") {
    val t = Tables(spark, sf)
    val day = "2024-01-15"
    val df = StorageQueries.prunedDay(t, day)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScan")
    val scan = scans.head
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("event_date"), s"date filter must prune partitions: $pf")
    // The pruned scan must select exactly the one matching partition.
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
    // And the filter must NOT survive as a post-scan row filter.
    val rowCount = df.count()
    val direct = t.events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(rowCount == direct && rowCount > 0)
  }

  test("partitioned layout is written once and reused") {
    val t = Tables(spark, sf)
    val root = StorageQueries.partitionedEvents(t)
    val m1 = new java.io.File(root, "_SUCCESS").lastModified()
    StorageQueries.partitionedEvents(t)
    assert(new java.io.File(root, "_SUCCESS").lastModified() == m1)
  }

  test("morton10 is an exact bit interleave: deinterleave recovers (x, y)") {
    // Evaluate the Column expression over a sampled grid and invert it
    // in Scala: zval's even bits must be x, odd bits y — injectivity
    // and exactness of the interleave, independent of the clustering
    // property tested below.
    import spark.implicits._
    val pts = for (x <- 0 until 1024 by 31; y <- 0 until 1024 by 37)
      yield (x.toLong, y.toLong)
    val rows = pts.toDF("x", "y")
      .withColumn("z", StorageQueries.morton10(col("x"), col("y")))
      .collect()
    assert(rows.length == pts.length)
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var dx = 0L; var dy = 0L
      (0 until 10).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y, s"morton($x,$y)=$z deinterleaved to ($dx,$dy)")
    }
  }

  test("z-order clusters BOTH dimensions; a plain sort clusters only one") {
    // Chunk the z-sorted (and, for contrast, x-sorted) row sequence
    // into 16 contiguous "files" and measure each chunk's span in x
    // and y. Under z-order both spans shrink toward domain/sqrt(16);
    // under the x sort, x is perfectly clustered but y's span stays at
    // the full domain — the reason min/max footer stats can't prune a
    // y-filter on an x-sorted layout.
    // High-entropy 10-bit dims even at sf0.001 (partkey/suppkey — the
    // declared query's dims — have tiny domains at this SF, which
    // would make every span trivially small).
    val t = Tables(spark, sf)
    val base = t.lineitem.select(
      (col("l_orderkey") % 1024).cast("long").as("x"),
      (floor(col("l_extendedprice")).cast("long") % 1024).as("y"))
    val n = base.count()
    def chunkSpans(sorted: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val rn = row_number().over(
        Window.orderBy(col("s1"), col("x"), col("y"))) - 1
      sorted
        .withColumn("chunk", (rn * 16 / n).cast("int"))
        .groupBy("chunk")
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .collect()
        .map(r => (r.getAs[Long]("sx"), r.getAs[Long]("sy"))).toSeq
    }
    val zSpans = chunkSpans(base.withColumn(
      "s1", StorageQueries.morton10(col("x"), col("y"))))
    val xSpans = chunkSpans(base.withColumn("s1", col("x")))
    val zAvgX = zSpans.map(_._1).sum / zSpans.size
    val zAvgY = zSpans.map(_._2).sum / zSpans.size
    val xAvgY = xSpans.map(_._2).sum / xSpans.size
    // z-order: every chunk bounded in BOTH dims (16 chunks of a 2-dim
    // z-curve confine each dim to 1/4 of the domain, modulo edge rows).
    assert(zAvgX <= 512 && zAvgY <= 512,
      s"z-order chunks not clustered: avg x-span $zAvgX, y-span $zAvgY")
    // the single-column sort leaves y unclustered (span ~ full domain).
    assert(xAvgY > 900, s"x-sorted y-span unexpectedly small: $xAvgY")
    assert(zAvgY < xAvgY / 2,
      s"z-order must at least halve the y-span: $zAvgY vs $xAvgY")
  }
  test("compaction_plan: next-fit-decreasing pack over the partition histogram") {
    val rows = graft.SparkEntry.queries("compaction_plan")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.length == 17, "all 17 partitions planned")
    // prefix sums consistent with the (n_rows desc, part) order
    val ordered = rows.sortBy(t => (-t._2, t._1))
    ordered.foldLeft(0L) { case (cum, (_, n, cumBefore, bin)) =>
      assert(cumBefore == cum, "cum_before must be the exact prefix sum")
      assert(bin == cum / 2000, "bin = prefix DIV capacity")
      cum + n
    }
    // whole partitions never split; each bin overfills by < 1 partition
    val maxPart = rows.map(_._2).max
    rows.groupBy(_._4).foreach { case (_, bs) =>
      assert(bs.map(_._2).sum < 2000 + maxPart)
    }
  }

}
