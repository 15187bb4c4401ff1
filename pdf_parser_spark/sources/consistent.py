"""Consistent cross-table snapshot sets — multi-table read isolation
for the maintained lineage.

Each maintained hop (chunks, embeddings, IVF, metrics, dedup index)
commits on its OWN manifest, so mid-refresh there is always a window
where chunks sit at v+1 while embeddings still reflect v. A reader
joining the two across that window sees chunk keys with no vector (or
stale vectors for edited text) — per-table snapshot isolation does not
compose into cross-table consistency. This is the problem lakehouse
catalogs solve with multi-table transactions (Nessie commits, Iceberg
REST-catalog multi-table commit); rebuilt here on two primitives the
cow table already has:

- **a set manifest** (one JSON file, atomic-replace commits like every
  table manifest): an append-only log of ``{set_id, tables: {name:
  {dir, version}}}`` entries, recorded by the lineage refresher ONLY
  after a fully-green refresh cycle — every table in the set reflects
  the same source version by construction (each hop's refresh is
  ledgered under its upstream's version; the refresher runs them in
  dependency order and skips downstream hops when a WAP audit
  quarantines the chunk hop).
- **tags as pin durability**: recording a set also tags every member
  table ``cset-<id>`` at its recorded version, and ``vacuum`` never
  reclaims a tagged snapshot — so a consistent set stays READABLE no
  matter how far the live tables advance, until the set itself is
  expired (which drops the tags and lets vacuum reclaim).

Readers call ``consistent_reads`` and get every table pinned to the
latest recorded set — joins line up even while the coordinator is
mid-cycle on newer versions. This is exactly Iceberg's
"serve the blessed snapshot while maintenance advances" pattern,
lifted from one table to the whole derivation chain.

Scale: a set commit is O(#tables) manifest writes; nothing touches
data files. Reference analog: none — the reference is stateless per
call; cross-table consistency is the operability tier a maintained
10^12-turn deployment needs.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from pdf_parser_spark.sources.cowtable import (create_tag, drop_tag,
                                               read_manifest, read_table)

_TAG = "cset-{}"


def _read_sets(set_path: str) -> dict:
    if not os.path.exists(set_path):
        return {"sets": []}
    with open(set_path) as fh:
        return json.load(fh)


def _commit_sets(set_path: str, doc: dict) -> None:
    os.makedirs(os.path.dirname(set_path) or ".", exist_ok=True)
    tmp = set_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    os.replace(tmp, set_path)


def record_consistent_set(set_path: str, tables: dict[str, str],
                          *, extra: dict | None = None) -> dict:
    """Record the CURRENT version of every table in ``tables``
    ({logical name: table dir}) as one consistent set, and tag each
    member ``cset-<id>`` so vacuum never reclaims the pinned
    snapshots. Call this only at a consistency point (the lineage
    refresher's green end-of-cycle is the intended caller); the
    recording itself is taken table-by-table, so the caller must be
    the single coordinator the cow table's trust model already
    assumes. Returns the recorded entry."""
    doc = _read_sets(set_path)
    set_id = 1 + max((e["set_id"] for e in doc["sets"]), default=0)
    entry = {"set_id": set_id,
             "tables": {name: {"dir": d,
                               "version": read_manifest(d)["version"]}
                        for name, d in tables.items()},
             **({"extra": extra} if extra else {})}
    # tags first, manifest-last (the same commit order every table
    # write uses): a crash mid-tagging leaves stray tags, never a
    # recorded set whose pins are missing
    for name, t in entry["tables"].items():
        create_tag(t["dir"], _TAG.format(set_id), version=t["version"])
    doc["sets"].append(entry)
    _commit_sets(set_path, doc)
    return entry


def latest_consistent_set(set_path: str) -> dict | None:
    sets = _read_sets(set_path)["sets"]
    return sets[-1] if sets else None


def consistent_set_history(set_path: str) -> list[dict]:
    return list(_read_sets(set_path)["sets"])


def consistent_reads(spark: SparkSession, set_path: str,
                     set_id: int | None = None) -> dict[str, DataFrame]:
    """Every table of the named (default: latest) consistent set,
    pinned to its recorded version — cross-table joins line up even
    while the live tables advance. Raises if no set is recorded or the
    id is unknown."""
    sets = _read_sets(set_path)["sets"]
    if not sets:
        raise ValueError(f"{set_path} records no consistent sets yet")
    if set_id is None:
        entry = sets[-1]
    else:
        by_id = {e["set_id"]: e for e in sets}
        if set_id not in by_id:
            raise ValueError(f"set {set_id} not recorded (have: "
                             f"{sorted(by_id)})")
        entry = by_id[set_id]
    return {name: read_table(spark, t["dir"], version=t["version"])
            for name, t in entry["tables"].items()}


def expire_consistent_sets(set_path: str, *, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` sets: their ``cset-<id>``
    tags are removed from every member table, releasing the pinned
    snapshots for the next ``vacuum``. The set log itself keeps only
    retained entries. A tag already gone (manual drop) is skipped, not
    an error — expiry must be idempotent."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    doc = _read_sets(set_path)
    doomed = doc["sets"][:-keep_last]
    doc["sets"] = doc["sets"][-keep_last:]
    dropped = 0
    for e in doomed:
        for name, t in e["tables"].items():
            try:
                drop_tag(t["dir"], _TAG.format(e["set_id"]))
                dropped += 1
            except ValueError:
                pass
    _commit_sets(set_path, doc)
    return {"expired_sets": len(doomed), "dropped_tags": dropped}
