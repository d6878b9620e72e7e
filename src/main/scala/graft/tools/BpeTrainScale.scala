package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.text.BpeTrain

/** BPE training cost measurement: train to EXHAUSTION (or the given
  * round budget) on the env-selected corpus and print rules learned,
  * wall time, per-round cost, and the corpus token mass before/after —
  * the evidence line BASELINE.md records for the trainer's
  * linear-in-rounds cost law. (The synthetic corpus has a 31-word
  * vocabulary, so exhaustion lands near Σ(len−1) ≈ 160 rules; the
  * 50k-rule INFERENCE cost law is separately pinned by BpeSpec's
  * kernel scale test — table size enters the kernel only through O(1)
  * hash lookups.)
  *
  * Usage: runMain graft.tools.BpeTrainScale [maxRounds]
  */
object BpeTrainScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = Sessions.local(Sessions.cpusFromEnv)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables(spark, sfDir).documents
    def tokenMass(v: org.apache.spark.sql.DataFrame): Long =
      v.agg(sum(size(col("syms")).cast("long") * col("cnt")))
        .collect()(0).getLong(0)
    val before = tokenMass(BpeTrain.vocabOf(docs))
    val t0 = System.nanoTime()
    val (learned, vocab) = BpeTrain.train(docs, rounds)
    val secs = (System.nanoTime() - t0) / 1e9
    val after = tokenMass(vocab)
    println(f"[bpe-train] $sfDir rules=${learned.size} " +
      f"wall=${secs}%.1f s per_rule=${secs / math.max(1, learned.size)}%.3f s " +
      f"corpus_tokens $before -> $after " +
      f"(x${before.toDouble / after}%.2f compression)")
    spark.stop()
  }
}
