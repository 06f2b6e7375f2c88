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
        par_set = set(par)
        add = [f for f in cur if f not in par_set]
        dele = sorted(f for f in par if f not in cur_set)
        if len(add) + len(dele) >= len(cur):
            continue  # the diff doesn't shrink the payload
        if [f for f in par if f in cur_set] + add != cur:
            continue  # reordered list: a diff can't reproduce it exactly
        out.pop(key)
        out[kb] = version - 1
        out[ka] = add
        out[kd] = dele
    # per-file skipping stats are the other O(live files) payload: a
    # commit carrying stats for 10^5 files re-serializes them all even
    # when only a handful of files changed (_carry_stats copies the
    # dict forward). Diff the dict the same way — entries are matched
    # by key with exact-equality values, and consumers only ever
    # .get(path), so no ordering contract exists to guard.
    cur_stats = dict(record.get("stats") or {})
    par_stats = parent.get("stats") or {}
    fs_cur = cur_stats.get("file_stats")
    fs_par = par_stats.get("file_stats")
    if isinstance(fs_cur, dict) and isinstance(fs_par, dict) and fs_par:
        # membership test, not .get(): a NEW key whose value is None
        # must land in the add-set (None would alias the missing-key
        # sentinel and break encode→materialize identity)
        add = {
            k: v for k, v in fs_cur.items() if k not in fs_par or fs_par[k] != v
        }
        dele = sorted(k for k in fs_par if k not in fs_cur)
        if len(add) + len(dele) < len(fs_cur):
            cur_stats.pop("file_stats")
            cur_stats["file_stats_base"] = version - 1
            cur_stats["file_stats_add"] = add
            cur_stats["file_stats_del"] = dele
            out["stats"] = cur_stats
    return out


def materialize(record: dict, load_parent) -> dict:
    """Resolve a (possibly delta-encoded) record to full lists.
    ``load_parent(version) -> dict`` must return the MATERIALIZED
    parent record (callers recurse through their own loader, bounded
    by the checkpoint cadence)."""
    stats_encoded = "file_stats_base" in (record.get("stats") or {})
    if not stats_encoded and not any(
        kb in record for _, kb, _a, _d in _LISTS
    ):
        return record
    out = dict(record)
    parents: dict[int, dict] = {}

    def parent_of(v: int) -> dict:
        if v not in parents:
            parents[v] = load_parent(v)
        return parents[v]

    for key, kb, ka, kd in _LISTS:
        if kb not in out:
            continue
        base = out.pop(kb)
        par = list(parent_of(base).get(key) or [])
        dele = set(out.pop(kd))
        add = out.pop(ka)
        out[key] = [f for f in par if f not in dele] + add
    if stats_encoded:
        stats = dict(out["stats"])
        base = stats.pop("file_stats_base")
        dele = set(stats.pop("file_stats_del"))
        add = stats.pop("file_stats_add")
        par_fs = (parent_of(base).get("stats") or {}).get("file_stats") or {}
        fs = {k: v for k, v in par_fs.items() if k not in dele}
        fs.update(add)
        stats["file_stats"] = fs
        out["stats"] = stats
    return out
