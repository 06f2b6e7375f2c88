"""Maintenance-while-writing storm: blind appends, merge-on-read DV
deletes, REORG PURGE and COPY INTO all racing on ONE table through the
lockless OCC commit path. The invariant is the serializability story:
every committed row is exactly once (no loss, no resurrection, no
duplicate), deleted ids never reappear, and a final purge settles all
DV debt. Snapshot-dependent ops are allowed to LOSE (CommitConflictError)
— they retry on the fresh snapshot — but never to corrupt."""

from __future__ import annotations

import pytest

import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq

from nrtwithdeltalake_spark.pipeline.tables import (
    CommitConflictError,
    VersionedTable,
)

APPENDERS = 2
BATCHES = 4
ROWS = 25
SEED_LO, SEED_N = 100_000, 60  # present from t0: delete targets



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def test_maintenance_storm_purge_copy_append_delete(spark, tmp_path):
    path = str(tmp_path / "storm")
    VersionedTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(SEED_LO + i, "seed") for i in range(SEED_N)],
            "id long, src string",
        ).repartition(4),
    )
    errors: list = []
    deleted_floor = {"v": SEED_LO}  # ids below this are gone

    def appender(worker: int) -> None:
        try:
            t = VersionedTable(spark, path)
            for b in range(BATCHES):
                lo = (worker * BATCHES + b) * ROWS
                t.append(
                    spark.createDataFrame(
                        [(lo + i, f"app{worker}") for i in range(ROWS)],
                        "id long, src string",
                    )
                )
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errors.append(e)

    def deleter() -> None:
        # DV-delete successive prefixes of the seed batch (present from
        # t0, so every committed delete applies deterministically);
        # retries on conflict — a snapshot-dependent op losing a race
        try:
            t = VersionedTable(spark, path)
            for step in range(1, 4):
                floor = SEED_LO + step * 5
                for _ in range(10):
                    try:
                        t.delete(
                            f"src = 'seed' AND id < {floor}", use_dv=True
                        )
                        deleted_floor["v"] = floor
                        break
                    except CommitConflictError:
                        continue
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def purger() -> None:
        try:
            t = VersionedTable(spark, path)
            for _ in range(6):
                try:
                    t.reorg_purge()
                except CommitConflictError:
                    continue  # lost to a concurrent DV commit: re-loop
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def copier() -> None:
        try:
            land = str(tmp_path / "land")
            os.makedirs(land, exist_ok=True)
            t = VersionedTable(spark, path)
            for b in range(3):
                ids = [200_000 + b * 20 + i for i in range(20)]
                pq.write_table(
                    pa.table(
                        {
                            "id": pa.array(ids, pa.int64()),
                            "src": pa.array(["copy"] * len(ids)),
                        }
                    ),
                    os.path.join(land, f"batch{b}.parquet"),
                )
                t.copy_into(land)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(w,)) for w in range(APPENDERS)
    ] + [
        threading.Thread(target=deleter),
        threading.Thread(target=purger),
        threading.Thread(target=copier),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    t = VersionedTable(spark, path)
    # final purge settles whatever DV debt the storm left behind
    t.reorg_purge()
    assert t.get_commit().dv_files == []

    rows = [(r.id, r.src) for r in t.read().collect()]
    assert len(rows) == len(set(rows)), "duplicate rows after storm"
    got_app = sorted(i for i, s in rows if s.startswith("app"))
    assert got_app == list(range(APPENDERS * BATCHES * ROWS)), (
        "append rows lost or duplicated"
    )
    got_seed = sorted(i for i, s in rows if s == "seed")
    assert got_seed == list(
        range(deleted_floor["v"], SEED_LO + SEED_N)
    ), f"seed rows diverged (floor={deleted_floor['v']})"
    got_copy = sorted(i for i, s in rows if s == "copy")
    assert got_copy == list(range(200_000, 200_060)), (
        "copy rows lost or duplicated"
    )
    # the registry survived the storm: a fresh COPY INTO re-run of the
    # same landing dir loads nothing
    out = t.copy_into(str(tmp_path / "land"))
    assert out["files_loaded"] == 0
