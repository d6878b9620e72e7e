package graft.functions

import graft.util.Det
import graft.{Q, Tables}

/** The SQL front door, exercised as declared queries: everything else
  * in the engine is DataFrame-first, but a user of the library can
  * equally register the tables as views and write `spark.sql(...)` —
  * including calls to the NATIVE expressions GraftExtensions injects
  * into the function registry. These two queries run entirely through
  * SQL text (no DataFrame combinators beyond view registration), so
  * the SQL parser → analyzer → registry path is part of the verified
  * surface, not just the typed API.
  */
object SqlQueries {

  /** TPC-H Q6 shape (public domain), the forecast-revenue-change
    * scan: a single filtered aggregate whose predicates must ALL land
    * in the parquet scan's PushedFilters — the pure scan-efficiency
    * query. Executed via spark.sql over a registered view; the text is
    * shared with the DuckDB oracle verbatim (the Det integer-sum form
    * is already dialect-neutral). */
  private val q6Sql =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
       |       ${Det.sqlDsum("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24
       |ORDER BY n_lines""".stripMargin

  private val sqlQ6 = Q("sql_q6_revenue_scan", q6Sql) { (s, dir) =>
    Tables(s, dir).lineitem.createOrReplaceTempView("lineitem")
    s.sql(q6Sql)
  }

  /** The native expressions through the SQL registry: graft_shingles
    * and graft_token_hash_stats resolved by name from SQL text (the
    * GraftExtensions injectFunction path). The oracle mirrors the
    * semantics with DuckDB list functions — so this pins BOTH that the
    * registration resolves AND that the native kernels still agree
    * with the portable definition when invoked via SQL. */
  private val sqlNative = Q(
    "sql_native_functions",
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |)
       |SELECT doc_id,
       |       CAST(len(${graft.dedup.DedupQueries.sqlNgramsOf("toks", 3)}) AS INTEGER) AS n_shingles,
       |       CAST(len(list_distinct(${graft.dedup.DedupQueries.sqlNgramsOf("toks", 3)})) AS INTEGER) AS n_distinct
       |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents.createOrReplaceTempView("documents")
    s.sql(
      """SELECT doc_id,
        |       size(graft_shingles(split(text, ' '), 3)) AS n_shingles,
        |       size(array_distinct(graft_shingles(split(text, ' '), 3))) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  /** The LLM-pipeline surface through the same front door: exact
    * dedup as ONE shared SQL text (md5-keyed group with copy counts
    * and min-doc survivor), run verbatim by both spark.sql over the
    * registered documents view AND the DuckDB oracle — extending the
    * dialect-neutral proof from the relational family (Q6) to the
    * dedup family. Same scale shape as `dedup_exact`: one map-side-
    * combined hash aggregate on the digest. */
  private val dedupSql =
    """SELECT md5(text) AS text_hash,
      |       CAST(count(*) AS BIGINT) AS n_copies,
      |       min(doc_id) AS survivor_doc
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY survivor_doc""".stripMargin

  private val sqlDedupExact = Q("sql_dedup_exact", dedupSql) { (s, dir) =>
    Tables(s, dir).documents.createOrReplaceTempView("documents")
    s.sql(dedupSql)
  }

  val queries: Seq[Q] = Seq(sqlQ6, sqlNative, sqlDedupExact)
}
