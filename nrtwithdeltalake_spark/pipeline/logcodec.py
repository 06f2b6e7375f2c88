"""Delta-encoded commit records — the log-compaction half of Delta's
log + checkpoint design (Delta VLDB'20 §3.1), applied to this engine's
self-contained JSON commits.

Why: every commit names the table's FULL live file list (plus the
cumulative DV sidecar list). Self-contained records make snapshot reads
O(1) log IO, but at 100 TB (~10^5-10^6 files after compaction) each of
the two cumulative lists is tens of MB of JSON — and a merge-heavy
table rewrites that payload EVERY commit, so the log grows with
(commits × live files), not (commits + file churn).

How: a commit whose list differs little from its parent stores only the
diff — ``{key}_base`` (the parent version), ``{key}_add`` (appended
entries, order preserved), ``{key}_del`` (removed entries) — and a
reader materializes by walking the parent chain. Every
``CHECKPOINT_EVERY``-th version stores the full lists, bounding the
walk (Delta's checkpoint cadence, default 10 commits, same idea).
Per-commit log cost becomes O(churn), which for append/merge/DV-delete
traffic is the task count, not the table size.

Exactness is structural, not assumed: the encoder DECODES its own diff
and falls back to the full list unless the roundtrip reproduces the
original list bit-for-bit (ordering included) — ops that arbitrarily
reorder (restore, compaction) simply store full lists. Old logs (full
lists everywhere) need no migration, and an encoded log stays readable
by version-pinned readers because materialization is pure local JSON.

Pure stdlib on purpose: both the native ``VersionedTable`` log layer
and the SparkSession-free ``versioned`` DataSource share this codec.
"""

from __future__ import annotations

CHECKPOINT_EVERY = 20

_LISTS = (
    ("files", "files_base", "files_add", "files_del"),
    ("dv_files", "dv_files_base", "dv_files_add", "dv_files_del"),
)


def encode(record: dict, parent: dict | None) -> dict:
    """Delta-encode ``record``'s cumulative lists against the
    MATERIALIZED ``parent`` record where beneficial and exact; returns
    a new dict (never mutates). Checkpoint versions and shrink-less
    diffs pass through unchanged."""
    version = record.get("version", 0)
    if parent is None or version % CHECKPOINT_EVERY == 0:
        return dict(record)
    out = dict(record)
    for key, kb, ka, kd in _LISTS:
        cur = list(record.get(key) or [])
        par = list(parent.get(key) or [])
        cur_set = set(cur)
        add = [f for f in cur if f not in set(par)]
        dele = sorted(f for f in par if f not in cur_set)
        if len(add) + len(dele) >= len(cur):
            continue  # the diff doesn't shrink the payload
        if [f for f in par if f in cur_set] + add != cur:
            continue  # reordered list: a diff can't reproduce it exactly
        out.pop(key)
        out[kb] = version - 1
        out[ka] = add
        out[kd] = dele
    return out


def materialize(record: dict, load_parent) -> dict:
    """Resolve a (possibly delta-encoded) record to full lists.
    ``load_parent(version) -> dict`` must return the MATERIALIZED
    parent record (callers recurse through their own loader, bounded
    by the checkpoint cadence)."""
    if not any(kb in record for _, kb, _a, _d in _LISTS):
        return record
    out = dict(record)
    parents: dict[int, dict] = {}
    for key, kb, ka, kd in _LISTS:
        if kb not in out:
            continue
        base = out.pop(kb)
        if base not in parents:
            parents[base] = load_parent(base)
        par = list(parents[base].get(key) or [])
        dele = set(out.pop(kd))
        add = out.pop(ka)
        out[key] = [f for f in par if f not in dele] + add
    return out
