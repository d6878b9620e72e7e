// Hosted under org.apache.spark.sql because the expression type-check
// surface (AbstractDataType) is private[sql] — the standard packaging
// pattern for third-party native expressions (same as VectorDot).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Production-size BPE tokenizer kernel: the classic per-word min-rank
  * merge loop (Sennrich et al. 2016; the GPT-2 reference `bpe()` loop)
  * as a native codegen expression over a BOUND merges table.
  *
  * Semantics per word (words = space-separated segments, so no merge
  * ever crosses a word boundary — same contract as the rank-order
  * replace chain in `graft.text.Bpe`):
  *
  *   1. split the word into code-point symbols;
  *   2. find the adjacent symbol pair with the LOWEST merge rank;
  *   3. merge every occurrence of that pair left-to-right;
  *   4. repeat until no adjacent pair is in the table.
  *
  * The row's token count is the summed per-word symbol count.
  *
  * Why this exists next to the replace chain: the chain is exact but
  * LINEAR IN MERGE COUNT — every rule is two full-string scans, so a
  * released ~50k-merge tokenizer would cost ~100k scans per row. This
  * kernel's cost is a function of the TEXT alone: each merge step is
  * one O(word) scan + one O(word) rewrite, the number of steps per
  * word is bounded by its length, and table size only enters through
  * O(1) hash lookups. 32 rules or 50k rules price identically — the
  * corpus pass stays scan-bound (the BpeSpec scale test pins this).
  * It also lifts the chain's a≠b restriction: identical-pair rules
  * (a,a), standard in released merges files, run exactly here.
  *
  * Parity: on any table the chain accepts (all ranks with a≠b), the
  * two formulations are the SAME function — a rank-r merge only
  * creates pairs involving its output symbol, which by training order
  * only participates in rules of rank > r, so "apply rules in rank
  * order to fixpoint" and "repeatedly merge the min-rank pair present"
  * coincide. BpeSpec proves bit-parity on the pinned table; the DuckDB
  * oracle replays the chain, so every `*_bpe` query's oracle-green row
  * re-proves it cross-engine at SF scale.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val ranks = new BpeRanks(merges.toArray)

  override def nullSafeEval(text: Any): Any =
    ranks.countTokens(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The precompiled table rides the plan as a reference object; its
    // lookup structures are @transient lazy, rebuilt once per executor.
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[BpeRanks].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ranksRef.countTokens($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The SEGMENTATION twin of [[BpeTokenCount]]: same bound table, same
  * per-word min-rank merge loop, but emitting the merged symbol string
  * ("sym sym | sym …", '|' the word sentinel — byte-identical to the
  * trimmed output of the `graft.text.Bpe` replace chain on a≠b
  * tables). This is the path that handles IDENTICAL-PAIR rules (a, a),
  * which the literal-replace chain structurally cannot (its two-pass
  * trick diverges on odd runs ≥ 5); `bpe_segment` routes to it
  * whenever the trained table contains one. Cost model identical to
  * the count kernel plus the output string build. */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_segment"

  @transient private lazy val ranks = new BpeRanks(merges.toArray)

  override def nullSafeEval(text: Any): Any =
    ranks.segment(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[BpeRanks].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ranksRef.segment($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Precompiled merges table: symbols interned to ints, pair ranks and
  * outputs in an open-addressed long→int table (key `(a << 32) | b`) —
  * zero boxing in the per-word loop. Serializable via the raw merges
  * array; lookups rebuild lazily per JVM. */
final class BpeRanks(val merges: Array[(String, String)]) extends Serializable {

  @transient private lazy val compiled: BpeRanks.Compiled =
    BpeRanks.compile(merges)

  /** Total BPE token count of a text: sum over space-separated words
    * of the word's final symbol count. Code points with no id (never
    * mentioned by any rule) are inert single-symbol tokens. */
  def countTokens(text: UTF8String): Long = {
    val c = compiled
    val s = text.toString
    val n = s.length
    // Reused per-row symbol buffer, grown to the longest word seen.
    var ids = new Array[Int](64)
    var total = 0L
    var i = 0
    while (i < n) {
      // Collect one word's code-point symbol ids.
      var len = 0
      while (i < n && s.charAt(i) != ' ') {
        val cp = s.codePointAt(i)
        i += Character.charCount(cp)
        if (len == ids.length) ids = java.util.Arrays.copyOf(ids, len * 2)
        ids(len) = if (cp < c.charIds.length) c.charIds(cp) else -1
        len += 1
      }
      if (i < n) i += 1 // skip the separator
      // Min-rank merge loop.
      while (len > 1) {
        var bestRank = Int.MaxValue
        var bestKey = 0L
        var j = 0
        while (j < len - 1) {
          val a = ids(j); val b = ids(j + 1)
          if (a >= 0 && b >= 0) {
            val key = (a.toLong << 32) | (b.toLong & 0xffffffffL)
            val r = c.pairRank.get(key)
            if (r < bestRank) { bestRank = r; bestKey = key }
          }
          j += 1
        }
        if (bestRank == Int.MaxValue) len = -len // sentinel: done
        else {
          // Merge every occurrence of the chosen pair, left-to-right.
          val a = (bestKey >>> 32).toInt
          val b = bestKey.toInt
          val out = c.pairOut.get(bestKey)
          var w = 0; var r = 0
          while (r < len) {
            if (r < len - 1 && ids(r) == a && ids(r + 1) == b) {
              ids(w) = out; r += 2
            } else { ids(w) = ids(r); r += 1 }
            w += 1
          }
          len = w
        }
      }
      total += math.abs(len)
    }
    total
  }

  /** Merged symbol STRING of a text: per word the min-rank loop over
    * (id, string) symbol pairs — identical merge decisions to
    * [[countTokens]] (same compiled table, same scan), the merged
    * string built by direct concatenation so no inverse id table is
    * needed; inert code points (no id) stay single-char symbols.
    * Words join with the `" | "` sentinel, matching the replace
    * chain's trimmed output exactly on tables both accept. */
  def segment(text: UTF8String): UTF8String = {
    val c = compiled
    val s = text.toString
    val n = s.length
    var ids = new Array[Int](64)
    var strs = new Array[String](64)
    val out = new java.lang.StringBuilder(n * 2)
    var first = true
    var i = 0
    while (i < n) {
      var len = 0
      while (i < n && s.charAt(i) != ' ') {
        val cp = s.codePointAt(i)
        val w = Character.charCount(cp)
        if (len == ids.length) {
          ids = java.util.Arrays.copyOf(ids, len * 2)
          strs = java.util.Arrays.copyOf(strs, len * 2)
        }
        ids(len) = if (cp < c.charIds.length) c.charIds(cp) else -1
        strs(len) = s.substring(i, i + w)
        i += w
        len += 1
      }
      if (i < n) i += 1
      var live = len
      while (live > 1) {
        var bestRank = Int.MaxValue
        var bestKey = 0L
        var j = 0
        while (j < live - 1) {
          val a = ids(j); val b = ids(j + 1)
          if (a >= 0 && b >= 0) {
            val key = (a.toLong << 32) | (b.toLong & 0xffffffffL)
            val r = c.pairRank.get(key)
            if (r < bestRank) { bestRank = r; bestKey = key }
          }
          j += 1
        }
        if (bestRank == Int.MaxValue) live = -live
        else {
          val a = (bestKey >>> 32).toInt
          val b = bestKey.toInt
          val o = c.pairOut.get(bestKey)
          var w = 0; var r = 0
          while (r < live) {
            if (r < live - 1 && ids(r) == a && ids(r + 1) == b) {
              ids(w) = o; strs(w) = strs(r) + strs(r + 1); r += 2
            } else { ids(w) = ids(r); strs(w) = strs(r); r += 1 }
            w += 1
          }
          live = w
        }
      }
      val m = math.abs(live)
      if (m > 0) {
        if (!first) out.append(" | ")
        var k = 0
        while (k < m) {
          if (k > 0) out.append(' ')
          out.append(strs(k))
          k += 1
        }
        first = false
      }
      ()
    }
    UTF8String.fromString(out.toString)
  }
}

object BpeRanks {

  /** charIds: code point → symbol id (-1 = inert); pairRank/pairOut:
    * (aId<<32|bId) → rank / merged symbol id. */
  private[graft] final class Compiled(
      val charIds: Array[Int],
      val pairRank: LongIntMap,
      val pairOut: LongIntMap)

  private def compile(merges: Array[(String, String)]): Compiled = {
    val symId = new java.util.HashMap[String, Integer]()
    def idOf(sym: String): Int = {
      val existing = symId.get(sym)
      if (existing != null) existing.intValue()
      else { val id = symId.size(); symId.put(sym, id); id }
    }
    val pairRank = new LongIntMap(merges.length)
    val pairOut = new LongIntMap(merges.length)
    var rank = 0
    while (rank < merges.length) {
      val (a, b) = merges(rank)
      val key = (idOf(a).toLong << 32) | (idOf(b).toLong & 0xffffffffL)
      // First (lowest) rank wins if a pair is listed twice.
      if (pairRank.get(key) == Int.MaxValue) {
        pairRank.put(key, rank)
        pairOut.put(key, idOf(a + b))
      }
      rank += 1
    }
    // Single-code-point symbols seed the per-char id table (BMP plus
    // any astral chars the table mentions; unmentioned code points are
    // inert and never merge, so -1 is exact, not an approximation).
    var maxCp = 0xffff
    symId.forEach { (sym, _) =>
      if (sym.codePointCount(0, sym.length) == 1)
        maxCp = math.max(maxCp, sym.codePointAt(0))
    }
    val charIds = Array.fill(maxCp + 1)(-1)
    symId.forEach { (sym, id) =>
      if (sym.codePointCount(0, sym.length) == 1)
        charIds(sym.codePointAt(0)) = id.intValue()
    }
    new Compiled(charIds, pairRank, pairOut)
  }

  /** Minimal open-addressed long→int hash table (linear probing,
    * power-of-two capacity, ≤0.5 load). `get` returns Int.MaxValue on
    * miss — the natural "no rank" for the min-rank scan. Keys are
    * always non-negative (two 31-bit ids packed), so -1 marks empty. */
  private[graft] final class LongIntMap(expected: Int) {
    private var cap = java.lang.Integer.highestOneBit(
      math.max(16, expected * 4 - 1))
    private var keys = Array.fill[Long](cap)(-1L)
    private var vals = new Array[Int](cap)
    private var n = 0

    private def slot(key: Long, ks: Array[Long]): Int = {
      var h = (key * 0x9e3779b97f4a7c15L >>> 40).toInt & (ks.length - 1)
      while (ks(h) != -1L && ks(h) != key) h = (h + 1) & (ks.length - 1)
      h
    }

    def put(key: Long, value: Int): Unit = {
      if ((n + 1) * 2 > cap) {
        val (ok, ov) = (keys, vals)
        cap *= 2
        keys = Array.fill[Long](cap)(-1L)
        vals = new Array[Int](cap)
        var i = 0
        while (i < ok.length) {
          if (ok(i) != -1L) { val s = slot(ok(i), keys); keys(s) = ok(i); vals(s) = ov(i) }
          i += 1
        }
      }
      val s = slot(key, keys)
      if (keys(s) == -1L) n += 1
      keys(s) = key
      vals(s) = value
    }

    def get(key: Long): Int = {
      val s = slot(key, keys)
      if (keys(s) == key) vals(s) else Int.MaxValue
    }
  }
}
