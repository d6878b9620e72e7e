package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding token accounting over a PINNED
  * merges table — the tokenizer-exact upgrade of `token_count`'s
  * "BPE-ish regex" estimate (the number every mixture/packing budget
  * actually bills against in production).
  *
  * Model: the classic BPE inference algorithm (Sennrich et al. 2016;
  * the GPT-2 reference implementation's `bpe()` loop) — split a word
  * into characters, then repeatedly merge the present pair with the
  * LOWEST merge rank until none applies. The merges table below was
  * trained offline with the standard count-and-merge training loop on
  * the sf0.001 documents corpus (deterministic: ties broken by pair
  * lexicographic order) and is pinned as part of the declared
  * semantics, exactly like the lang-ID marker table — production
  * swaps in its tokenizer's released merges file.
  *
  * Execution trick — rank-order sequential application: because a
  * merge at rank r only ever CREATES symbols (and therefore pairs) of
  * rank > r, applying the rules one at a time in rank order is
  * exactly the min-rank loop. That turns per-word BPE into a chain of
  * literal string `replace`s over a space-delimited symbol string —
  * all codegen'd built-ins, no UDF, no explode: the whole corpus pass
  * is one narrow projection. Each rule is applied TWICE back to back:
  * left-to-right `replace` consumes the trailing delimiter of a
  * match, so of k adjacent overlapping occurrences it merges the
  * odd ones; the survivors are then isolated (separated by merged
  * symbols), so the second application completes them — two passes
  * are exact for any run length PROVIDED the rule's two symbols
  * differ (a = b admits runs like `a a a a a` where left-to-right
  * greed diverges from the min-rank loop on odd runs ≥ 5; the
  * constructor rejects such rules, see the guard below). Released
  * tokenizer merges files that contain identical-pair rules need the
  * native min-rank kernel
  * ([[org.apache.spark.sql.graft.BpeTokenCount]]) instead.
  *
  * Scale: ~64 literal scans over a ~2× symbolized copy of each text —
  * linear per row, embarrassingly parallel, zero shuffle. At 100 TB
  * this is scan-bound exactly like `token_count`.
  */
object Bpe {

  /** Rank-ordered merges (rank = position). Trained offline on the
    * sf0.001 documents vocabulary, 32 steps. */
  val Merges: Seq[(String, String)] = Seq(
    "e" -> "r", "o" -> "r", "i" -> "n", "o" -> "w",
    "s" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar",
    "m" -> "er", "a" -> "t", "a" -> "n", "c" -> "an",
    "s" -> "can", "c" -> "o", "co" -> "lu", "colu" -> "m",
    "colum" -> "n", "d" -> "ow", "in" -> "dow", "w" -> "indow",
    "d" -> "er", "or" -> "der", "or" -> "t", "s" -> "ort",
    "par" -> "t", "u" -> "p", "a" -> "g", "ag" -> "g",
    "a" -> "lu", "alu" -> "e", "v" -> "alue", "in" -> "e")

  // Declared-semantics guard: the two-pass replace trick is only exact
  // when a rule's symbols differ (doc above). Identical-pair rules are
  // legal BPE and appear in released merges files — they must go
  // through the min-rank kernel, not this chain.
  require(Merges.forall { case (a, b) => a != b },
    "Bpe.Merges: identical-pair rules (a,a) are not exact under the " +
      "two-pass replace chain; use the min-rank BPE kernel instead")

  /** Word separator sentinel in the symbol string: space becomes `|`
    * BEFORE per-char symbolization, so no merge pattern (always of
    * the form " a b ") can cross a word boundary. The corpus contract
    * (TESTDATA.md) is space-separated lowercase text, so `|` is free;
    * a corpus where it isn't would pre-translate it. */
  private val Sep = "|"

  /** ` a b c ` symbol form of a text: every char becomes `char ` and
    * the whole string gets one leading space, so every symbol is
    * space-delimited on both sides. */
  private def symbolized(text: Column): Column =
    concat(lit(" "),
      regexp_replace(translate(text, " ", Sep), "(.)", "$1 "))

  /** The merged symbol string under an ARBITRARY a≠b merges table —
    * [[symbolized]] with every rule applied twice in rank order (see
    * the class doc for why twice is exact, and for why identical-pair
    * rules are rejected: they need the min-rank kernel). The trained
    * tables `bpe_train` learns feed this for segmentation
    * (`bpe_segment`); the pinned [[Merges]] keeps its dedicated
    * wrapper below. */
  def mergedSymbolsWith(
      text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (a, b) => a != b },
      "mergedSymbolsWith: identical-pair rules (a,a) are not exact " +
        "under the two-pass replace chain; use the min-rank BPE kernel")
    merges.foldLeft(symbolized(text)) { case (acc, (a, b)) =>
      val (pat, rep) = (lit(s" $a $b "), lit(s" $a$b "))
      replace(replace(acc, pat, rep), pat, rep)
    }
  }

  /** The merged symbol string under the pinned [[Merges]]. */
  def mergedSymbols(text: Column): Column =
    mergedSymbolsWith(text, Merges)

  /** Token count read off a [[mergedSymbols]] string: symbols carry
    * exactly one trailing space each (plus the single leading space),
    * so symbols = spaces − 1; separators don't bill. */
  def countFromMerged(s: Column): Column =
    (length(s) - length(replace(s, lit(" "), lit("")))
      - lit(1)
      - (length(s) - length(replace(s, lit(Sep), lit("")))))
      .cast("long")

  /** Per-row BPE token count of a text column — the replace-chain
    * formulation (exact, but linear in merge count; fixture-grade). */
  def tokenCount(text: Column): Column =
    countFromMerged(mergedSymbols(text))

  /** Per-row BPE token count via the NATIVE min-rank merge-loop kernel
    * ([[org.apache.spark.sql.graft.BpeTokenCount]]) bound to the same
    * pinned table — the same function as [[tokenCount]] (BpeSpec pins
    * bit-parity; every `*_bpe` oracle replays the chain against it),
    * at production-tokenizer cost: table size only enters through O(1)
    * hash lookups, so a released ~50k-merge table prices like this
    * 32-rule one. The billing queries run THIS; the chain remains as
    * the cross-engine oracle twin. */
  def tokenCountNative(text: Column): Column =
    org.apache.spark.sql.graft.ColumnOps.bpeTokenCount(text, Merges)

  // ---- DuckDB oracle twins: the same algorithm, same builtins. ----

  /** SQL expression producing [[mergedSymbols]] for `textExpr`. */
  def sqlMergedSymbols(textExpr: String): String = {
    val sym =
      s"' ' || regexp_replace(replace($textExpr, ' ', '$Sep'), '(.)', '\\1 ', 'g')"
    Merges.foldLeft(sym) { case (acc, (a, b)) =>
      s"replace(replace($acc, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ')"
    }
  }

  /** SQL expression counting tokens off an already-merged symbol
    * string column `s` (pair with a CTE so the merge chain is written
    * once, not four times). */
  def sqlCountFromMerged(s: String): String =
    s"CAST(length($s) - length(replace($s, ' ', '')) - 1" +
      s" - (length($s) - length(replace($s, '$Sep', ''))) AS BIGINT)"
}
