#!/usr/bin/env python3
"""Build a degenerate-corpus fixture for oracle-parity regression tests.

Copies an sf dir and replaces documents.parquet with a corpus designed to
exercise the capped bucket machinery where the driver SFs cannot:
  - 80 sub-3-token docs: empty shingle sets -> NULL band hashes. More
    than MaxBucketPairDocs (64) of them, so an oracle that fails to drop
    NULL buckets star-edge-pairs them (the bug class fixed in round 4:
    oracle 368 vs spark 352 rows).
  - 40 docs over 20 shared templates: real LSH collisions + exact dups.

Usage: python3 tools/degenerate_corpus.py [src_sf_dir] [dest_dir]
Then:  sbt -batch "runMain graft.tools.VerifyOne dedup_minhash_lsh,dedup_components,dedup_chunk_lsh,dedup_simhash_pairs <dest> /tmp/v1"
       python3 tools/check_oracle.py <dest> /tmp/v1   # expect PASS
"""
import shutil, sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdeg"

shutil.rmtree(dest, ignore_errors=True)
shutil.copytree(src, dest)
duckdb.sql(f"""
COPY (
  SELECT CAST(i AS BIGINT) AS doc_id,
         CASE WHEN i < 80 THEN 'tok' || CAST(i AS VARCHAR)
              ELSE 'the quick brown fox jumps over the lazy dog variant '
                   || CAST(i % 20 AS VARCHAR) END AS text,
         'en' AS lang, 'src' || CAST(i % 3 AS VARCHAR) AS source,
         CAST(20 AS INTEGER) AS n_chars
  FROM range(120) t(i)
) TO '{dest}/documents.parquet' (FORMAT PARQUET)
""")
print(f"degenerate corpus written to {dest} (120 docs, 80 NULL-band-hash)")
