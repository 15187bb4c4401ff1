"""Deterministic 10x-sf0.1 corpus for the scale-up oracle evidence
(round-5 verdict task #7): tile `documents` and `embeddings` tenfold
with re-keyed ids and a per-copy perturbation, symlink the unchanged
tables, and run the heavy-operator subset through jobs/oracle_check.py
on the result::

    python jobs/scale10_corpus.py [--src /root/testdata/sf0.1] \
        [--dst /root/testdata_scale10]
    python jobs/oracle_check.py --sf-dir /root/testdata_scale10 \
        --only docs_duplicated_spans,docs_remove_spans,\
emb_semantic_dedup,docs_cow_merge,docs_cow_mor_merge,\
docs_dup_probe_maintained --json-out ORACLE_SCALE10_r5.json

Key-space discipline (learned the hard way): registry entries reserve
id offsets for their own synthetic rows — emb_semantic_dedup seeds
exact duplicates at vec_id+1_000_000 and the cow-merge CDC batch
inserts doc_id+10_000_000 twins — so the copy offsets here must stay
clear of them: documents copies at k*1_000_000 (base ids < 10M, twins
land 10M-20M, disjoint) and embeddings copies at k*100_000_000 (a
k*1_000_000 offset COLLIDED with the seeded duplicates and produced a
one-row oracle mismatch from two vectors sharing a vec_id).

Everything is pure deterministic SQL over the driver-generated sf0.1
parquet — no randomness, no external data; DuckDB writes the parquet so
the scaled corpus is identical across runs and across engines.
"""

from __future__ import annotations

import argparse
import os

PASSTHROUGH = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events")


def build(src: str, dst: str, copies: int = 10) -> None:
    import duckdb
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT d.doc_id + k.k * 1000000 AS doc_id,
             d.text || ' copy' || k.k AS text,
             d.lang, d.source,
             d.n_chars + length(' copy' || k.k) AS n_chars
      FROM read_parquet('{src}/documents.parquet') d,
           (SELECT unnest(generate_series(0, {copies - 1})) AS k) k
      ORDER BY doc_id
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT e.vec_id + k.k * 100000000 AS vec_id,
             CAST(list_prepend(e.embedding[1] + k.k * 0.001,
                               e.embedding[2:]) AS FLOAT[]) AS embedding,
             e.label
      FROM read_parquet('{src}/embeddings.parquet') e,
           (SELECT unnest(generate_series(0, {copies - 1})) AS k) k
      ORDER BY vec_id
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in PASSTHROUGH:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(src, f"{t}.parquet"), p)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/testdata_scale10")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    build(a.src, a.dst, a.copies)
    print(f"scaled corpus at {a.dst}")
