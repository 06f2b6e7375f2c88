"""SCD Type-2 dimension maintenance over ``VersionedTable`` — history-
preserving upserts, the canonical warehouse capability one step beyond
the reference's overwrite-style merge (its ``whenMatchedUpdateAll`` at
``/root/reference/COPY_MSQL_TO_SILVER.py:209`` is SCD Type-1: old
attribute values are destroyed). Type-2 closes the old row version and
inserts a new one, so every key carries its full attribute history and
any past state is queryable with an as-of predicate.

Formulation (pure composition over the existing MERGE, no new commit
machinery): version columns ``__valid_from`` / ``__valid_to`` /
``__is_current`` are managed here; the physical apply is ONE
``VersionedTable.merge`` keyed on ``keys + [__valid_from]`` —

* a *close* row (key, old ``__valid_from``) matches the open version →
  update-all stamps ``__valid_to = batch_ts``, ``__is_current = false``;
* a *new-version* row (key, ``__valid_from = batch_ts``) matches
  nothing → insert-all.

Change detection joins the batch against only the CURRENT slice and
compares the tracked columns null-safely; unchanged rows generate no
writes at all, which makes replaying a batch (same ``batch_ts``) a
structural no-op — the crash-replay idempotency invariant the
reference's pipeline relies on (SURVEY.md §7 hard part 5) holds for
history-preserving loads too.

Scale: the detect join is keys+tracked columns against the current
slice (a fraction of the table; at 100 TB partition the dimension so
the current slice prunes), and the merge rewrites only files containing
touched (key, valid_from) pairs — the same copy-on-write bound as every
other merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import VersionedTable

VALID_FROM = "__valid_from"
VALID_TO = "__valid_to"
IS_CURRENT = "__is_current"


def _stamp(df: DataFrame, batch_ts: str) -> DataFrame:
    return (
        df.withColumn(VALID_FROM, F.lit(batch_ts))
        .withColumn(VALID_TO, F.lit(None).cast("string"))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def scd2_init(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    batch_ts: str,
) -> VersionedTable:
    """Initial load: every source row becomes an open version."""
    _assert_unique(source, keys)
    return VersionedTable.create(spark, path, _stamp(source, batch_ts))


def _assert_unique(source: DataFrame, keys: list[str]) -> None:
    dup = (
        source.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "SCD2 source must be unique per key — dedup upstream "
            "(merge-style latest-wins is ambiguous for history)"
        )


def scd2_apply(
    table: VersionedTable,
    source: DataFrame,
    keys: list[str],
    tracked: list[str],
    batch_ts: str,
) -> dict:
    """Apply one batch. Returns counts: new keys, changed keys (old
    version closed + new version opened), unchanged and stale (no
    write; stale = batch_ts not strictly newer than the open version —
    the monotonicity rule that makes out-of-order replay safe)."""
    _assert_unique(source, keys)
    cur = table.read().filter(F.col(IS_CURRENT))
    s = source.alias("s")
    t = cur.alias("t")
    joined = s.join(t, on=keys, how="left").select(
        *[F.col(k) for k in keys],
        *[F.col(f"s.{c}").alias(f"s_{c}") for c in tracked],
        *[F.col(f"t.{c}").alias(f"t_{c}") for c in tracked],
        F.col(f"t.{VALID_FROM}").alias("t_from"),
        F.col(f"t.{IS_CURRENT}").isNotNull().alias("has_current"),
    )
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"s_{c}").eqNullSafe(F.col(f"t_{c}"))
    # Monotonicity guard: a row whose batch_ts is not strictly newer
    # than the key's open version is STALE and writes nothing. This is
    # what makes replay safe in every ordering — re-delivering an old
    # batch after newer ones have applied (the at-least-once streaming
    # case) cannot close a newer version backwards or resurrect an old
    # value; it also means a genuine change needs an advancing
    # timestamp, the same batch-grain watermark rule the reference's
    # ledger enforces (COPY_MSQL_TO_SILVER.py:157).
    status = (
        F.when(~F.col("has_current"), "new")
        .when(F.lit(batch_ts) <= F.col("t_from"), "stale")
        .when(differs, "changed")
        .otherwise("unchanged")
    )
    marked = joined.withColumn("__status", status).cache()
    n_new = marked.filter(F.col("__status") == "new").count()
    n_changed = marked.filter(F.col("__status") == "changed").count()
    n_unchanged = marked.filter(F.col("__status") == "unchanged").count()
    n_stale = marked.filter(F.col("__status") == "stale").count()

    changed_or_new = marked.filter(
        F.col("__status").isin("new", "changed")
    ).select(*keys, "__status", "t_from")
    if n_new + n_changed == 0:
        marked.unpersist()
        return {
            "new": 0,
            "changed": 0,
            "unchanged": n_unchanged,
            "stale": n_stale,
        }

    # close rows: the full OLD row with the validity window shut. Pull
    # the old row from the current slice (update-all rewrites the whole
    # row, so it must be byte-complete).
    closes = (
        cur.join(
            changed_or_new.filter(F.col("__status") == "changed").select(
                *keys
            ),
            on=keys,
            how="left_semi",
        )
        .withColumn(VALID_TO, F.lit(batch_ts))
        .withColumn(IS_CURRENT, F.lit(False))
    )
    opens = _stamp(
        source.join(changed_or_new.select(*keys), on=keys, how="left_semi"),
        batch_ts,
    )
    table.merge(
        closes.unionByName(opens), keys=keys + [VALID_FROM]
    )
    marked.unpersist()
    return {
        "new": n_new,
        "changed": n_changed,
        "unchanged": n_unchanged,
        "stale": n_stale,
    }


def scd2_as_of(snapshot: DataFrame, ts: str) -> DataFrame:
    """The dimension as of ``ts``: rows whose validity window covers it
    (half-open [from, to))."""
    return snapshot.filter(
        (F.col(VALID_FROM) <= ts)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > ts))
    )
