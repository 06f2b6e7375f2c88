"""Incrementally-maintained table checksum: the order-independent
content fingerprint of ``operators/reshape.py::q_table_checksum`` kept
near-real-time over a ``VersionedTable`` from its change feed.

Why this exists: the reference's bronze→silver copies
(``/root/reference/COPY_MSQL_TO_SILVER.py:128-218``) have no content
validation — a partial load or double-applied batch is invisible. A
commutative checksum makes validation O(delta) forever:

* row fingerprint fp(r) = first 15 hex digits of md5(canonical row
  string) as a 60-bit integer — pure Catalyst (md5/conv), no UDF;
* table checksum = exact decimal SUM of fps (+ row count);
* the SUM is commutative and invertible, so the change feed maintains
  it algebraically: ``+fp`` for insert/update_postimage rows, ``-fp``
  for delete/update_preimage rows. No base re-read, ever — unlike
  ``IncrementalRollup``'s touched-group recompute (required there
  because min/max aren't invertible), a checksum refresh costs exactly
  one aggregate over the CDF slice.

At 100 TB: bootstrap is one map-side-combinable aggregate over the
snapshot (the same single-exchange plan ``tests/test_plans.py::
test_table_checksum_single_agg_shuffle`` pins); every refresh is one
aggregate over the delta. Cross-cluster / cross-engine table comparison
(the migration-validation story) then exchanges 1 row, not 100 TB.

Overflow: fps < 2^60 ≈ 1.15e18; decimal(38,0) holds the sum for ~1e19
rows — the running sum is renormalized nowhere because it never needs
to be.

Crash posture: the reflected base version rides the state table's own
commit record (``extra_stats`` on create/overwrite) — stamp and state
are ONE atomic put-if-absent publish, so no crash window can leave a
state commit whose stamp lies, and no published commit is ever mutated
in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import VersionedTable

_ADD_TYPES = ("insert", "update_postimage")
_SUB_TYPES = ("delete", "update_preimage")
_NULL_MARK = "\x00"  # distinguishes NULL from absent in the canonical string

# Version of the fingerprint FORMULA (canonicalization + hash), stamped
# into every state commit. A running sum is only meaningful under ONE
# formula: when the formula changes (e.g. the round-6 switch to
# unix_micros timestamp canonicalization), a pre-existing state table
# would silently mix old-formula sums with new-formula deltas and
# diverge until verify(). A stamp mismatch forces re-bootstrap instead.
# Bump this whenever fingerprint_expr's output changes for any input.
FP_FORMULA_VERSION = 2


def fingerprint_expr(
    cols: list[str], dtypes: dict[str, T.DataType] | None = None
) -> F.Column:
    """60-bit per-row fingerprint over the named columns, in declared
    order — the same md5→60-bit→decimal construction as
    ``operators/reshape.py::_row_fp``. Each column is cast to string
    with NULL marked explicitly (concat_ws silently drops NULLs, which
    would collide ('a',NULL,'b') with ('a','b')). Session-timezone
    timestamps canonicalize to epoch microseconds when ``dtypes`` is
    supplied — a plain string cast renders in the session timezone, so
    the same table would checksum differently across sessions/engines;
    dates, decimals, and strings already render timezone-free."""
    canon = []
    for c in cols:
        col = F.col(c)
        if isinstance((dtypes or {}).get(c), T.TimestampType):
            col = F.unix_micros(col)
        canon.append(F.coalesce(col.cast("string"), F.lit(_NULL_MARK)))
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *canon).cast("binary")), 1, 15), 16, 10
    ).cast("decimal(38,0)")


class IncrementalChecksum:
    """A maintained (n_rows, checksum) fingerprint of a VersionedTable.

    ``cols`` fixes the canonical column order; defaults to the base
    schema's order at construction. The column list is part of the
    checksum's identity — compare checksums only across equal lists.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: VersionedTable,
        path: str,
        cols: list[str] | None = None,
    ):
        self.spark = spark
        self.base = base
        self.path = path
        schema = base.schema()
        self.cols = list(cols) if cols else [f.name for f in schema.fields]
        self.dtypes = {f.name: f.dataType for f in schema.fields}
        # the canonical string form a value hashes through depends on
        # its TYPE (5 as int vs 5.0 after an int→double widening, float
        # repr after float→double, decimal scale growth) — so a schema
        # TYPE change invalidates the running sum exactly like a
        # formula change does, even though every value is "the same".
        # Positional (name-free) on purpose: a rename_column leaves the
        # fingerprint untouched and must keep resuming.
        self._schema_sig = ",".join(
            self.dtypes[c].simpleString() for c in self.cols
        )

    # -- state ----------------------------------------------------------------

    def exists(self) -> bool:
        return VersionedTable.exists(self.path)

    def _table(self) -> VersionedTable:
        return VersionedTable(self.spark, self.path)

    def last_refreshed_version(self) -> int:
        if not self.exists():
            return -1
        stats = self._table().get_commit().stats
        if stats.get("fp_formula") != FP_FORMULA_VERSION:
            # state computed under a different fingerprint formula (or a
            # pre-versioning commit): its running sum cannot absorb
            # this formula's deltas — treat as never-refreshed so the
            # next refresh() re-bootstraps from the snapshot
            return -1
        if stats.get("fp_schema") != self._schema_sig:
            # the base schema's type signature changed (e.g. a safe
            # int→bigint widening): pre-widening rows were summed under
            # the old canonical string forms, so deltas computed under
            # the new types would silently diverge — re-bootstrap
            return -1
        return stats.get("base_version", -1)

    def current(self) -> tuple[int, int]:
        """(n_rows, checksum) currently reflected."""
        row = self._table().read().collect()[0]
        return int(row["n_rows"]), int(row["checksum"])

    # -- compute --------------------------------------------------------------

    def _full(self, snapshot: DataFrame) -> DataFrame:
        return snapshot.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(fingerprint_expr(self.cols, self.dtypes)), F.lit(0)
            )
            .cast("decimal(38,0)")
            .alias("checksum"),
        )

    def _delta(self, changes: DataFrame) -> DataFrame:
        sign = (
            F.when(F.col("_change_type").isin(*_ADD_TYPES), F.lit(1))
            .when(F.col("_change_type").isin(*_SUB_TYPES), F.lit(-1))
            .otherwise(F.lit(0))
            .cast("decimal(2,0)")
        )
        row_delta = (
            F.when(F.col("_change_type") == "insert", F.lit(1))
            .when(F.col("_change_type") == "delete", F.lit(-1))
            .otherwise(F.lit(0))
        )
        return changes.agg(
            F.coalesce(F.sum(row_delta), F.lit(0)).cast("long").alias("d_rows"),
            F.coalesce(
                F.sum(sign * fingerprint_expr(self.cols, self.dtypes)), F.lit(0)
            )
            .cast("decimal(38,0)")
            .alias("d_checksum"),
        )

    def compute_now(self) -> tuple[int, int]:
        """Direct (n_rows, checksum) over the current base snapshot —
        the verification twin of the maintained state."""
        row = self._full(self.base.read()).collect()[0]
        return int(row["n_rows"]), int(row["checksum"])

    # -- refresh ----------------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the checksum up to the base's latest version.

        Bootstrap: one aggregate over the snapshot. Steady state: one
        aggregate over the CDF slice, added to the stored state. If the
        feed was vacuumed past our watermark, re-bootstrap (the change
        feed raises; a checksum, unlike a join view, can always be
        rebuilt from the snapshot alone)."""
        base_version = self.base.latest_version()
        last = self.last_refreshed_version()
        if last == base_version:
            return {"refreshed": False, "base_version": base_version}

        if last >= 0:
            try:
                # bound the slice to the CAPTURED version: a concurrent
                # base commit landing after latest_version() must not
                # leak into a delta stamped with the older base_version
                # (it would be re-applied next refresh and silently
                # diverge the checksum)
                changes = self.base.change_feed(last).filter(
                    F.col("_commit_version") <= base_version
                )
            except ValueError:
                last = -1  # vacuumed past the watermark → rebuild

        stamp = {
            "base_version": base_version,
            "fp_formula": FP_FORMULA_VERSION,
            "fp_schema": self._schema_sig,
        }
        if last < 0:
            state = self._full(self.base.read(base_version))
            if self.exists():
                self._table().overwrite(state, extra_stats=stamp)
            else:
                VersionedTable.create(self.spark, self.path, state, extra_stats=stamp)
            return {
                "refreshed": True,
                "bootstrap": True,
                "base_version": base_version,
            }

        d = self._delta(changes).collect()[0]
        n_rows, checksum = self.current()
        state = self.spark.createDataFrame(
            [(n_rows + int(d["d_rows"]), str(checksum + int(d["d_checksum"])))],
            "n_rows bigint, checksum string",
        ).select("n_rows", F.col("checksum").cast("decimal(38,0)").alias("checksum"))
        self._table().overwrite(state, extra_stats=stamp)
        return {
            "refreshed": True,
            "bootstrap": False,
            "base_version": base_version,
            "d_rows": int(d["d_rows"]),
        }

    def verify(self) -> dict:
        """Compare the maintained state against a direct recompute of
        the current snapshot — the audit a migration/backfill runs."""
        self.refresh()
        maintained = self.current()
        actual = self.compute_now()
        return {
            "match": maintained == actual,
            "maintained": {"n_rows": maintained[0], "checksum": str(maintained[1])},
            "actual": {"n_rows": actual[0], "checksum": str(actual[1])},
        }

