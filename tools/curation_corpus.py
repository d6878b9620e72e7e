#!/usr/bin/env python3
"""Planted corpus where EVERY curation-pipeline stage fires.

Copies an sf dir and replaces documents.parquet with 12 docs engineered
so each of the six `corpus_curation_pipeline` stages removes at least
one doc (the driver corpora leave stages 2/5/6 structurally inert:
no boilerplate-dominated page, all 20 primary domains clean, no
near-dup pair among gate survivors). Mirrored by CurationSpec's
plantedCorpus — keep the two in sync.

Usage: python3 tools/curation_corpus.py <srcSfDir> <outDir>
"""
import sys, shutil, os
import duckdb

src, out = sys.argv[1], sys.argv[2]
if os.path.exists(out):
    shutil.rmtree(out)
shutil.copytree(src, out)

GOOD = ("running sorting merging finding working grouping linking "
        "parsing caching joining scanning mapping folding batching "
        "packing splitting hashing ranking mixing sampling counting "
        "tracking loading saving pruning probing seeking testing "
        "binding framing closing opening reading writing sharing "
        "holding making taking looking and doing").split()


def good_text(tag):
    # Token sets are DISJOINT across tags (every token carries the tag):
    # token-3-gram shingles never overlap between docs, so the only
    # near-dup pair in the corpus is the planted 7/47 one.
    return " ".join(f"{GOOD[i % len(GOOD)]}{tag}" for i in range(40))


rows = [
    # src0 = site-0.com (kept clean; in-linked by site-1 via doc 29->1)
    (1,   good_text(0),  "en", "src0"),   # survives to the end
    (16,  good_text(3),  "en", "src0"),   # text copied by src3 doc 136
    (21,  good_text(6),  "en", "src0"),   # text copied by src3 doc 121
    (33,  "ok go",       "en", "src0"),   # stage 2: boilerplate-dominated
    (141, good_text(9),  "en", "src0"),   # stage 1: canonical dup of 21
    # src1 = site-1.org (kept clean; in-linked by site-0 via 1->7, 33->29)
    (7,   good_text(12), "en", "src1"),   # near-dup pair head
    (12,  good_text(15), "zh", "src1"),   # stage 3: lang-ID disagrees
    (18,  " ".join(["the", "mess"] * 20), "en", "src1"),  # stage 4: low quality
    (29,  good_text(18), "en", "src1"),   # survives; links back to site-0
    (47,  good_text(12)[: good_text(12).rfind(" ")] + " changed",
          "en", "src1"),                  # stage 6: near-dup of doc 7
    # src3 = site-3.com (stage 5: every copy non-canonical -> blocked)
    (121, good_text(6),  "en", "src3"),
    (136, good_text(3),  "en", "src3"),
]

con = duckdb.connect()
con.sql("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)")
for doc_id, text, lang, source in rows:
    con.execute("INSERT INTO d VALUES (?, ?, ?, ?, ?)",
                [doc_id, text, lang, source, len(text)])
con.sql(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
print(f"wrote {len(rows)} docs to {out}/documents.parquet")
