"""Per-file bloom-filter indexes for equality data skipping.

Min/max footer stats (``tables._footer_file_stats``) prune range and
point predicates on CLUSTERED columns — but a point lookup on a
high-cardinality column the table is NOT sorted by (a user id in an
event log, a document id in a corpus) finds every file's [min, max]
spanning the whole domain, so nothing prunes and the scan reads 100 TB
to return one row. The classic fix (Databricks' bloom filter index,
parquet's column bloom filters) is a tiny probabilistic digest per
(file, column): `might_contain(v)` false ⇒ the file PROVABLY holds no
row with that value and is skipped; true ⇒ read it (false positives
only cost bytes, never rows — exactness always comes from Spark
re-applying the predicate).

Scale posture:
- Sidecars are data-adjacent (``<table>/_bloom/``), ~1.2 bytes/row at
  the default 1% fpp, capped at 1 MiB per (file, column). The commit
  log stores only the sidecar PATH (O(1) per file), riding the same
  ``file_stats`` carry/delta-encode machinery as min/max.
- Build cost is O(churn): only a commit's NEW files are digested, via
  column-pruned parquet reads of just the indexed columns
  (thread-pooled on the driver here; at cluster scale the same digest
  folds into the write job as a per-task pass — the sidecar format is
  deliberately writer-agnostic).
- Check cost is bounded on BOTH sides: executors probe the sidecar (a
  KB-scale read) before opening a data file — per-partition O(1),
  no driver fan-in — and the driver additionally prunes partitions
  outright when the min/max-surviving candidate set is small
  (``DRIVER_PRUNE_MAX`` files), so the common point-lookup case also
  saves task scheduling without ever risking an O(all files) planning
  read.

Pure stdlib + optional pyarrow (build side) on purpose: the executor
check runs inside DataSource workers with no SparkSession.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os
import tempfile

DEFAULT_FPP = 0.01
MIN_BITS = 1 << 10  # 128 B floor: tiny files still get a real filter
MAX_BITS = 1 << 23  # 1 MiB cap per (file, column); fpp degrades past it
DRIVER_PRUNE_MAX = 64  # planning-side sidecar reads are bounded by this

# arrow type name prefixes we index: integers and strings only. Floats
# are excluded (str() canon is representation-fragile), bools carry no
# information beyond min/max, timestamps/decimals push down as typed
# literals min/max already handles.
_INDEXABLE_PREFIXES = ("int", "uint", "large_string", "string")


def canon(value) -> bytes | None:
    """Canonical hash encoding, identical at build (pyarrow pylist
    values) and query (Spark filter literals) time. None = this value
    can't be bloom-checked (the check must then pass the file)."""
    if value is None or isinstance(value, bool):
        return None
    if isinstance(value, int):
        return b"i:" + str(value).encode()
    if isinstance(value, str):
        return b"s:" + value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return b"b:" + bytes(value)
    return None


def _hashes(data: bytes) -> tuple[int, int]:
    d = hashlib.blake2b(data, digest_size=16).digest()
    # double hashing (Kirsch-Mitzenmacher): k indexes from two 64-bit
    # halves; h2 forced odd so strides cover power-of-two tables
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def params(n_items: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_items`` at ``fpp`` — m rounded up to
    a power of two (masking beats modulo in the hot probe loop), capped
    to [MIN_BITS, MAX_BITS]."""
    n = max(1, int(n_items))
    ideal = -n * math.log(fpp) / (math.log(2) ** 2)
    m = max(MIN_BITS, min(MAX_BITS, 1 << max(1, math.ceil(ideal) - 1).bit_length()))
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def build_bits(values, m: int, k: int) -> bytearray:
    bits = bytearray(m >> 3)
    mask = m - 1
    for v in values:
        enc = canon(v)
        if enc is None:
            continue  # nulls: equality never matches them in SQL
        h1, h2 = _hashes(enc)
        for i in range(k):
            idx = (h1 + i * h2) & mask
            bits[idx >> 3] |= 1 << (idx & 7)
    return bits


def might_contain(col_filter: dict, value) -> bool:
    """False ⇒ value provably absent from the file. ``col_filter`` is
    one decoded sidecar column entry."""
    enc = canon(value)
    if enc is None:
        return True
    m, k, bits = col_filter["m"], col_filter["k"], col_filter["_bits"]
    mask = m - 1
    h1, h2 = _hashes(enc)
    for i in range(k):
        idx = (h1 + i * h2) & mask
        if not bits[idx >> 3] & (1 << (idx & 7)):
            return False
    return True


def sidecar_name(data_file: str) -> str:
    """Deterministic per data file — a retried commit attempt re-digests
    the same new files into the same sidecar (idempotent overwrite)."""
    h = hashlib.sha256(data_file.encode("utf-8")).hexdigest()[:24]
    return f"{h}.bloom.json"


def write_sidecar(bloom_dir: str, data_file: str, cols: dict, n_rows: int) -> str:
    os.makedirs(bloom_dir, exist_ok=True)
    out = os.path.join(bloom_dir, sidecar_name(data_file))
    payload = {
        "n_rows": n_rows,
        "cols": {
            c: {"m": e["m"], "k": e["k"], "b64": base64.b64encode(e["_bits"]).decode()}
            for c, e in cols.items()
        },
    }
    fd, tmp = tempfile.mkstemp(dir=bloom_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, out)  # atomic: readers never see a torn sidecar
    return out


def load_sidecar(path: str) -> dict | None:
    """Decoded sidecar {col: {m, k, _bits}}, or None if missing/torn —
    pruning is strictly an IO reducer, so absence just keeps the file
    in the scan."""
    try:
        with open(path) as f:
            raw = json.load(f)
        return {
            c: {"m": e["m"], "k": e["k"], "_bits": base64.b64decode(e["b64"])}
            for c, e in raw.get("cols", {}).items()
        }
    except (OSError, ValueError, KeyError):
        return None


def file_may_match_bloom(sidecar_path: str, eq_filters) -> bool:
    """Driver/executor-shared skip check: False only when some pushed
    equality is PROVABLY unsatisfiable in this file. ``eq_filters`` is
    ((col, op, value), ...) with op in {'=', 'in'}."""
    cols = load_sidecar(sidecar_path)
    if not cols:
        return True
    for col, op, value in eq_filters:
        cf = cols.get(col)
        if cf is None:
            continue
        if op == "=":
            if not might_contain(cf, value):
                return False
        elif op == "in":
            if not any(might_contain(cf, v) for v in value):
                return False
    return True


def build_sidecars(
    files: list[str],
    columns: list[str],
    bloom_dir: str,
    fpp: float = DEFAULT_FPP,
) -> dict[str, str]:
    """Digest ``columns`` of each NEW data file into one sidecar per
    file; returns {data_file: sidecar_path}. Column-pruned parquet
    reads, thread-pooled — O(churn) IO, no SparkSession. Columns whose
    arrow type isn't indexable (floats, nested, …) are silently
    skipped; a file none of whose requested columns are indexable gets
    no sidecar."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    want = list(dict.fromkeys(columns))

    def _one(fpath: str) -> tuple[str, str] | None:
        try:
            pf = pq.ParquetFile(fpath)
            have = {
                fld.name: str(fld.type)
                for fld in pf.schema_arrow
                if fld.name in want
            }
            cols = [
                c
                for c, t in have.items()
                if t.startswith(_INDEXABLE_PREFIXES)
            ]
            if not cols:
                pf.close()
                return None
            tbl = pf.read(columns=cols)
            pf.close()
        except OSError:
            return None
        n = tbl.num_rows
        entries: dict[str, dict] = {}
        for c in cols:
            m, k = params(n, fpp)
            entries[c] = {
                "m": m,
                "k": k,
                "_bits": build_bits(tbl.column(c).to_pylist(), m, k),
            }
        return fpath, write_sidecar(bloom_dir, fpath, entries, n)

    out: dict[str, str] = {}
    with ThreadPoolExecutor(max_workers=min(16, max(2, len(files)))) as ex:
        for r in ex.map(_one, files):
            if r is not None:
                out[r[0]] = r[1]
    return out
