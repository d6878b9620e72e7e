// Hosted under org.apache.spark.sql because Expression↔Column bridging
// (classic.ExpressionUtils) is private[sql] — same packaging pattern as
// VectorDot.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-level helpers needing catalyst internals. */
object ColumnOps {

  /** Wrap a column in [[AssertNotNull]]: the output is statically
    * non-nullable (so downstream schemas carry `nullable = false` at
    * PLAN level — no RDD round-trip) and a NULL at runtime fails the
    * job, which is the warehouse-contract semantic
    * (bpi_etl_bigquery.py:238-242: BigQuery rejects a load whose data
    * violates REQUIRED). */
  def assertNotNull(c: Column, path: Seq[String]): Column =
    ExpressionUtils.column(AssertNotNull(ExpressionUtils.expression(c), path))

  /** Word n-gram shingles over a token-array column via the native
    * codegen'd [[Shingles]] expression (no session registration
    * needed — builds the Column directly). */
  def shingles(c: Column, n: Int): Column =
    ExpressionUtils.column(Shingles(ExpressionUtils.expression(c), n))

  /** Single-MD5-pass token hash statistics (min token hash + rolling
    * hash) via the native [[TokenHashStats]] expression. */
  def tokenHashStats(c: Column): Column =
    ExpressionUtils.column(TokenHashStats(ExpressionUtils.expression(c)))

  /** Per-row BPE token count under a bound merges table via the native
    * min-rank merge-loop kernel ([[BpeTokenCount]]) — cost a function
    * of the text, not the table size. */
  def bpeTokenCount(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokenCount(ExpressionUtils.expression(c), merges))

  /** Merged-symbol segmentation under a bound merges table via the
    * native min-rank kernel ([[BpeSegment]]) — the path that handles
    * identical-pair rules the replace chain must reject. */
  def bpeSegment(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeSegment(ExpressionUtils.expression(c), merges))
}
