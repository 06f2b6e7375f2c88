"""SQL surface for versioned tables — the full lifecycle: ``CREATE
TABLE ... AS SELECT`` / ``INSERT INTO`` / ``INSERT OVERWRITE`` /
``MERGE INTO`` / ``DELETE FROM`` / ``UPDATE`` / ``ALTER TABLE`` (column
DDL + CHECK constraints) routed to the ``VersionedTable`` API, plus the
Delta-extension maintenance verbs Spark's grammar lacks (``OPTIMIZE`` /
``VACUUM [DRY RUN]`` / ``RESTORE`` / ``DESCRIBE HISTORY``),
shape-matched strictly.

The reference is SQL-first — its MERGE is string-built T-SQL executed
through a SQL session (``/root/reference/COPY_MSQL_TO_SILVER.py:
200-209,223-249``) — and Delta exposes the same three statements as
SQL. This engine's mutations were Python-API-only; this module closes
that gap for migrated SQL workloads.

Parsing is NOT hand-rolled: statements go through **Spark's own SQL
parser** (``sessionState().sqlParser().parsePlan``), and this module
interprets the resulting Catalyst logical plan (``MergeIntoTable`` /
``DeleteFromTable`` / ``UpdateTable``) — so syntax, quoting, comments
and expression grammar are exactly Spark SQL's. The interpreter then
maps plan nodes onto the table API:

* target resolution — ``versioned.`/abs/path``` addresses a table by
  root path (the ``delta.`/path``` convention); any other name is
  looked up in the catalog and must be a table registered via
  ``VersionedTable.register`` (its LOCATION is the ``_current/``
  manifest dir the registration maintains).
* ``MERGE``: the ON clause must be a conjunction of same-name equality
  keys (``t.k = s.k``) — exactly the shape the reference string-builds
  (``:203-206``). Clauses map to ``merge()``'s parameters; target/source
  aliases must be ``t``/``s`` (or be omitted) when clause conditions
  reference columns, because the API evaluates those predicates over
  aliases of those names. ``WHEN MATCHED THEN DELETE`` conditions may
  reference only source columns (the API's CDC-flag semantics: an
  UNMATCHED delete-flagged row is a no-op, not an insert).
* Unsupported shapes — non-equi ON, ``UPDATE SET col=...`` in a matched
  clause (the API is UPDATE ALL), conditional ``INSERT``, column-list
  inserts — raise ``UnsupportedSqlError`` loudly; nothing degrades to
  a silent approximation.

Scale posture: this is a dispatcher — the statement's execution is the
same copy-on-write merge / DV delete / update path the Python API
takes; no extra plan, shuffle, or driver materialization is added.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import VersionedTable


class UnsupportedSqlError(ValueError):
    """The statement parsed, but maps onto no versioned-table operation."""


# ---------------------------------------------------------------------------
# plan-node helpers (py4j)


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _opt(jopt):
    return jopt.get() if jopt.isDefined() else None


def _cls(jobj) -> str:
    return jobj.getClass().getSimpleName()


def _relation_parts(node) -> tuple[str | None, list[str]]:
    """(alias, multipart identifier) of a target/source relation node,
    unwrapping one SubqueryAlias if present."""
    alias = None
    if _cls(node) == "SubqueryAlias":
        alias = node.alias()
        node = node.child()
    if _cls(node) != "UnresolvedRelation":
        raise UnsupportedSqlError(
            f"cannot resolve relation node {_cls(node)} — expected a table "
            "name or aliased table name"
        )
    return alias, _seq(node.multipartIdentifier())


def resolve_versioned(spark: SparkSession, parts: list[str]) -> VersionedTable:
    """A VersionedTable from a statement's table identifier: either
    ``versioned.`/path``` (path addressing) or a catalog name whose
    LOCATION is a ``register()``-maintained ``_current/`` dir."""
    if len(parts) == 2 and parts[0].lower() == "versioned":
        root = parts[1]
        if not VersionedTable.exists(root):
            raise ValueError(f"no versioned table at path {root!r}")
        return VersionedTable(spark, root)
    name = ".".join(f"`{p}`" for p in parts)
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    location = next(
        (r.data_type for r in rows if r.col_name == "Location"), None
    )
    if not location:
        raise ValueError(f"catalog table {name} has no LOCATION")
    path = re.sub(r"^[a-z][a-z0-9+.-]*:(//)?", "", location)
    if os.path.basename(path.rstrip("/")) != "_current":
        raise UnsupportedSqlError(
            f"{name} is not a versioned table registered via register() "
            f"(location {location!r} is not a _current/ manifest dir) — "
            "DML through this dispatcher only mutates versioned tables"
        )
    root = os.path.dirname(path.rstrip("/"))
    if not VersionedTable.exists(root):
        raise ValueError(f"{name}: no commit log found at {root!r}")
    return VersionedTable(spark, root)


# ---------------------------------------------------------------------------
# condition/text utilities


def _strip_outer_parens(sql: str) -> str:
    s = sql.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0 and i < len(s) - 1:
                return s  # outer parens don't wrap the whole string
        s = s[1:-1].strip()
    return s


def _split_top_and(sql: str) -> list[str]:
    """Split a Catalyst-printed condition on top-level ANDs."""
    s = _strip_outer_parens(sql)
    out, depth, last = [], 0, 0
    i = 0
    up = s.upper()
    while i < len(s):
        ch = s[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "'":  # skip string literal
            j = i + 1
            while j < len(s) and s[j] != "'":
                j += 1
            i = j
        elif depth == 0 and up.startswith(" AND ", i):
            out.append(s[last:i])
            i += 4
            last = i + 1
        i += 1
    out.append(s[last:])
    return [_strip_outer_parens(p) for p in out]


_EQ_KEY = re.compile(
    r"^\s*`?(?:(?P<la>[A-Za-z_][\w]*)`?\s*\.\s*)?`?(?P<lc>[A-Za-z_][\w]*)`?\s*"
    r"=\s*`?(?:(?P<ra>[A-Za-z_][\w]*)`?\s*\.\s*)?`?(?P<rc>[A-Za-z_][\w]*)`?\s*$"
)


def _merge_keys(cond_sql: str) -> list[str]:
    """Equality key columns from an ON condition; requires the
    reference's shape — a conjunction of same-name column equalities."""
    keys = []
    for part in _split_top_and(cond_sql):
        m = _EQ_KEY.match(part)
        if not m or m.group("lc").lower() != m.group("rc").lower():
            raise UnsupportedSqlError(
                f"MERGE ON clause term {part!r} is not a same-name column "
                "equality (t.k = s.k) — the merge API joins on key "
                "columns; rewrite the condition as key equalities"
            )
        keys.append(m.group("lc"))
    return keys


_ALIAS_REF = re.compile(r"(?<![\w.`])([A-Za-z_]\w*)\s*\.")


def _check_aliases(cond_sql: str, allowed: set[str], where: str) -> None:
    refs = {m.group(1) for m in _ALIAS_REF.finditer(cond_sql)}
    bad = refs - allowed
    if bad:
        raise UnsupportedSqlError(
            f"{where} references alias(es) {sorted(bad)}; the merge API "
            f"evaluates this predicate over aliases {sorted(allowed)} — "
            "alias the target as `t` and the source as `s`"
        )


_SQL_BARE_KEYWORDS = frozenset(
    """and or not in is null true false like escape between case when then
    else end cast as distinct interval exists rlike div
    bigint int integer smallint tinyint long short byte double float real
    decimal numeric string varchar char boolean date timestamp timestamp_ntz
    binary
    year years month months week weeks day days hour hours minute minutes
    second seconds""".split()
)


def _require_qualified(cond_sql: str, alias: str, where: str) -> None:
    """Reject BARE column identifiers in a predicate the merge API
    evaluates on one side only. An unqualified column in a matched-DELETE
    condition (``WHEN MATCHED AND amount < 0 THEN DELETE``) would
    silently resolve against SOURCE rows under the API's CDC-flag
    semantics even when the author meant the target's column — require
    every reference to be ``s.``-qualified so intent is explicit."""
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", cond_sql)):
        if i % 2:
            continue  # quoted literal
        for m in re.finditer(r"(?<![\w.`'])([A-Za-z_]\w*)(?![\w`])", seg):
            tok = m.group(1)
            end = m.end()
            rest = seg[end:].lstrip()
            if rest.startswith(".") or rest.startswith("("):
                continue  # qualifier or function call
            if tok.lower() in _SQL_BARE_KEYWORDS:
                continue
            raise UnsupportedSqlError(
                f"{where} references bare column {tok!r}; this predicate "
                f"is evaluated over SOURCE rows only — qualify every "
                f"column as `{alias}.{tok}` to make that explicit"
            )


def _strip_alias(cond_sql: str, alias: str) -> str:
    """Remove `alias.` qualifiers (for predicates the API evaluates on
    one side only, where qualified references would not resolve) —
    only OUTSIDE single-quoted string literals, so a literal value that
    happens to contain ``t.`` survives untouched."""
    pat = re.compile(rf"(?<![\w.`]){re.escape(alias)}\s*\.\s*")
    out = []
    # split keeps the quoted spans (odd indices) verbatim; '' escapes
    # stay inside one span because the regex is non-greedy per quote pair
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", cond_sql)):
        out.append(seg if i % 2 else pat.sub("", seg))
    return "".join(out)


def _plan_df(spark: SparkSession, jplan) -> DataFrame:
    """A DataFrame over an unresolved Catalyst subtree (Dataset.ofRows
    resolves it against the session catalog) — how subquery sources and
    CTAS bodies run without re-parsing statement text."""
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


def _source_df(spark: SparkSession, sql_text: str, node) -> DataFrame:
    """DataFrame for the USING source: a named table resolves through
    the session catalog; any other subtree (subquery) runs via
    Dataset.ofRows, with balanced-paren extraction from the statement
    text as the fallback."""
    if _cls(node) == "SubqueryAlias" and _cls(node.child()) == "UnresolvedRelation":
        return spark.table(".".join(_seq(node.child().multipartIdentifier())))
    if _cls(node) == "UnresolvedRelation":
        return spark.table(".".join(_seq(node.multipartIdentifier())))
    try:
        inner = node.child() if _cls(node) == "SubqueryAlias" else node
        return _plan_df(spark, inner)
    except Exception:
        pass  # fall back to text extraction below
    m = re.search(r"\bUSING\b", sql_text, re.IGNORECASE)
    if not m:
        raise UnsupportedSqlError("MERGE statement has no USING clause")
    i = sql_text.find("(", m.end())
    if i < 0:
        raise UnsupportedSqlError(
            f"cannot extract MERGE source (node {_cls(node)})"
        )
    depth = 0
    j = i
    while j < len(sql_text):
        ch = sql_text[j]
        if ch == "'":  # skip string literal wholesale ('' = escaped quote)
            j += 1
            while j < len(sql_text):
                if sql_text[j] == "'":
                    if j + 1 < len(sql_text) and sql_text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return spark.sql(sql_text[i + 1 : j])
        j += 1
    raise UnsupportedSqlError("unbalanced parentheses in MERGE source")


# ---------------------------------------------------------------------------
# statement executors


def _execute_merge(spark: SparkSession, plan, sql_text: str) -> dict:
    t_alias, t_parts = _relation_parts(plan.targetTable())
    table = resolve_versioned(spark, t_parts)
    src_node = plan.sourceTable()
    s_alias = src_node.alias() if _cls(src_node) == "SubqueryAlias" else None
    source = _source_df(spark, sql_text, src_node)

    for alias, side in ((t_alias, "target"), (s_alias, "source")):
        if alias is not None and alias not in ("t", "s"):
            # conditions below are evaluated over t/s; enforce up front
            # rather than letting a predicate silently miss its alias
            raise UnsupportedSqlError(
                f"{side} alias {alias!r} unsupported — alias the target "
                "as `t` and the source as `s` (or omit aliases)"
            )

    keys = _merge_keys(plan.mergeCondition().sql())

    matched_update_condition = None
    delete_condition = None
    saw_update_star = False
    for a in _seq(plan.matchedActions()):
        kind = _cls(a)
        cond = _opt(a.condition())
        if kind == "UpdateStarAction":
            if saw_update_star:
                raise UnsupportedSqlError("multiple UPDATE SET * clauses")
            saw_update_star = True
            if cond is not None:
                _check_aliases(cond.sql(), {"t", "s"}, "WHEN MATCHED AND ...")
                matched_update_condition = cond.sql()
        elif kind == "DeleteAction":
            if delete_condition is not None:
                raise UnsupportedSqlError("multiple WHEN MATCHED DELETE clauses")
            if saw_update_star:
                # SQL MERGE: the FIRST matching clause wins, so a row
                # satisfying both the update and a LATER delete condition
                # must UPDATE. The merge API's delete flag wins over the
                # update unconditionally — only delete-before-update
                # order has matching semantics; anything else would be a
                # silent divergence.
                raise UnsupportedSqlError(
                    "WHEN MATCHED ... THEN DELETE after an UPDATE clause: "
                    "SQL first-clause-wins would UPDATE rows matching "
                    "both, but the merge API's delete flag wins — put "
                    "the DELETE clause before the UPDATE clause"
                )
            if cond is None:
                raise UnsupportedSqlError(
                    "unconditional WHEN MATCHED THEN DELETE is unsupported: "
                    "the API's delete flag is evaluated on SOURCE rows "
                    "(CDC semantics — unmatched flagged rows are no-ops, "
                    "not inserts); add a source-column condition"
                )
            _check_aliases(cond.sql(), {"s"}, "WHEN MATCHED ... THEN DELETE")
            _require_qualified(cond.sql(), "s", "WHEN MATCHED ... THEN DELETE")
            delete_condition = _strip_alias(cond.sql(), "s")
        else:
            raise UnsupportedSqlError(
                f"matched clause {kind} unsupported — the merge API is "
                "UPDATE ALL (`UPDATE SET *`) or DELETE"
            )

    inserts = _seq(plan.notMatchedActions())
    if len(inserts) != 1 or _cls(inserts[0]) != "InsertStarAction":
        raise UnsupportedSqlError(
            "exactly one `WHEN NOT MATCHED THEN INSERT *` clause is "
            "required (the merge API always inserts unmatched source rows)"
        )
    if _opt(inserts[0].condition()) is not None:
        raise UnsupportedSqlError("conditional INSERT is unsupported")

    nmbs_delete = None
    nmbs_update = None
    nmbs_update_condition = None
    for a in _seq(plan.notMatchedBySourceActions()):
        kind = _cls(a)
        cond = _opt(a.condition())
        if cond is not None:
            _check_aliases(cond.sql(), {"t"}, "WHEN NOT MATCHED BY SOURCE")
        cond_sql = _strip_alias(cond.sql(), "t") if cond is not None else None
        if kind == "DeleteAction":
            if nmbs_delete is not None:
                raise UnsupportedSqlError("multiple BY SOURCE DELETE clauses")
            nmbs_delete = cond_sql or "true"
        elif kind == "UpdateAction":
            if nmbs_update is not None:
                raise UnsupportedSqlError("multiple BY SOURCE UPDATE clauses")
            nmbs_update = {}
            for asn in _seq(a.assignments()):
                col = asn.key().sql().strip("`")
                _check_aliases(asn.value().sql(), {"t"}, "BY SOURCE UPDATE SET")
                nmbs_update[col] = _strip_alias(asn.value().sql(), "t")
            nmbs_update_condition = cond_sql
        else:
            raise UnsupportedSqlError(f"BY SOURCE clause {kind} unsupported")

    return table.merge(
        source,
        keys,
        delete_condition=delete_condition,
        matched_update_condition=matched_update_condition,
        not_matched_by_source_delete=nmbs_delete,
        not_matched_by_source_update=nmbs_update,
        not_matched_by_source_update_condition=nmbs_update_condition,
    )


def _execute_delete(spark: SparkSession, plan) -> dict:
    _, parts = _relation_parts(plan.table())
    table = resolve_versioned(spark, parts)
    return {"version": table.delete(plan.condition().sql())}


def _execute_update(spark: SparkSession, plan) -> dict:
    _, parts = _relation_parts(plan.table())
    table = resolve_versioned(spark, parts)
    cond = _opt(plan.condition())
    assignments = {}
    for asn in _seq(plan.assignments()):
        assignments[asn.key().sql().strip("`")] = F.expr(asn.value().sql())
    return {
        "version": table.update(
            cond.sql() if cond is not None else "true", assignments
        )
    }


# ---------------------------------------------------------------------------
# Delta-extension statements Spark's parser does not know (OPTIMIZE /
# VACUUM / DESCRIBE HISTORY): matched strictly by shape BEFORE parsePlan.
# The identifier grammar matches one table reference — `versioned`.`/p`,
# db.t, or a bare name, each part optionally backquoted.

_IDENT = r"((?:`[^`]+`|[\w]+)(?:\s*\.\s*(?:`[^`]+`|[\w]+))*)"
_OPTIMIZE_RE = re.compile(
    rf"^\s*OPTIMIZE\s+{_IDENT}\s*"
    r"(?:WHERE\s+(.+?)\s*)?"
    r"(?:ZORDER\s+BY\s*\(\s*([^)]+?)\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)
# one conjunct of an OPTIMIZE WHERE: col <op> literal (int/float/str)
_OPT_WHERE_TERM_RX = re.compile(
    r"^\s*`?(\w+)`?\s*(>=|<=|=|<|>)\s*('(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*$"
)


def _parse_optimize_where(cond: str) -> list[tuple]:
    """``OPTIMIZE ... WHERE`` accepts a conjunction of simple
    range/equality terms on stat-tracked columns — the shapes the
    [min, max] file pruner can act on. Anything else raises rather
    than silently compacting the whole table."""
    out = []
    for term in re.split(r"\s+AND\s+", cond, flags=re.IGNORECASE):
        m = _OPT_WHERE_TERM_RX.match(term)
        if not m:
            raise UnsupportedSqlError(
                f"OPTIMIZE WHERE supports conjunctions of "
                f"`col <op> literal` (op in >=, <=, =, <, >); got "
                f"{term.strip()!r}"
            )
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if lit.startswith("'"):
            val: object = lit[1:-1].replace("''", "'")
        elif re.fullmatch(r"-?\d+", lit):
            val = int(lit)
        else:
            val = float(lit)
        out.append((col, op, val))
    return out
_VACUUM_RE = re.compile(
    rf"^\s*VACUUM\s+{_IDENT}\s*"
    r"(?:RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*(DRY\s+RUN)?\s*;?\s*$",
    re.IGNORECASE,
)
_REORG_RE = re.compile(
    rf"^\s*REORG\s+TABLE\s+{_IDENT}\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_CREATE_RE = re.compile(
    rf"^\s*SHOW\s+CREATE\s+TABLE\s+{_IDENT}\s*;?\s*$", re.IGNORECASE
)
_COPY_INTO_RE = re.compile(
    rf"^\s*COPY\s+INTO\s+{_IDENT}\s+FROM\s+'([^']+)'\s+"
    r"FILEFORMAT\s*=\s*(\w+)"
    r"(?:\s+PATTERN\s*=\s*'([^']+)')?"
    r"(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?"
    r"(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)


def _show_create_stmt(table) -> str:
    """Reconstructable DDL for a versioned table — column types,
    identity specs (both modes), generated expressions, DEFAULTs and
    NOT NULL inline, followed by ALTER/SET statements for CHECK
    constraints and table properties (which the CREATE grammar doesn't
    carry). The output is RUNNABLE: executing each ``;``-separated
    statement against a fresh path rebuilds an equivalent table (the
    round-trip test pins this)."""
    ident = table.identity_columns()
    modes = table.identity_modes()
    gen = table.generated_columns()
    dflt = table.column_defaults()
    nn = set(table.not_null_columns())
    cols = []
    for f in table.schema().fields:
        # simpleString as-is: uppercasing would also uppercase NESTED
        # struct/map field names, silently changing the rebuilt schema
        line = f"  `{f.name}` {f.dataType.simpleString()}"
        if f.name in ident:
            start, step = ident[f.name]
            mode = (
                "ALWAYS"
                if modes.get(f.name, "always") == "always"
                else "BY DEFAULT"
            )
            line += (
                f" GENERATED {mode} AS IDENTITY "
                f"(START WITH {start} INCREMENT BY {step})"
            )
        elif f.name in gen:
            line += f" GENERATED ALWAYS AS ({gen[f.name]})"
        if f.name in dflt:
            line += f" DEFAULT {dflt[f.name]}"
        if f.name in nn:
            line += " NOT NULL"
        cols.append(line)
    tgt = f"versioned.`{table.path}`"
    create = f"CREATE TABLE {tgt} (\n" + ",\n".join(cols) + "\n)"
    pcols = table.partition_columns()
    if pcols:
        create += "\nPARTITIONED BY (" + ", ".join(pcols) + ")"
    stmts = [create]
    for name, sql in sorted(table.constraints().items()):
        if name.startswith("notnull:"):
            continue  # already inline as NOT NULL
        stmts.append(f"ALTER TABLE {tgt} ADD CONSTRAINT {name} CHECK ({sql})")
    props = table.properties()
    if props:
        # SQL single-quote escaping ('' ) keeps the output runnable for
        # values carrying apostrophes (e.g. harvested string min/max)
        esc = lambda s: str(s).replace("'", "''")  # noqa: E731
        kv = ", ".join(
            f"'{esc(k)}' = '{esc(v)}'" for k, v in sorted(props.items())
        )
        stmts.append(f"ALTER TABLE {tgt} SET TBLPROPERTIES ({kv})")
    return ";\n".join(stmts)


def _quoted_kv(raw: str | None) -> dict[str, str]:
    """``'k' = 'v', ...`` option lists (COPY INTO FORMAT_OPTIONS /
    COPY_OPTIONS)."""
    if not raw or not raw.strip():
        return {}
    out = {}
    for m in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", raw):
        out[m.group(1)] = m.group(2)
    return out
_HISTORY_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+HISTORY\s+{_IDENT}\s*;?\s*$", re.IGNORECASE
)
_DETAIL_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+DETAIL\s+{_IDENT}\s*;?\s*$", re.IGNORECASE
)
_CONVERT_RE = re.compile(
    r"^\s*CONVERT\s+TO\s+VERSIONED\s+parquet\s*\.\s*`([^`]+)`\s*;?\s*$",
    re.IGNORECASE,
)
# Delta's CREATE TABLE ... [SHALLOW|DEEP] CLONE src [VERSION AS OF n]
# (extension grammar Spark's parser lacks — shape-matched like OPTIMIZE)
_CLONE_RE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+{_IDENT}\s+(?:(SHALLOW|DEEP)\s+)?CLONE\s+"
    rf"{_IDENT}(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    rf"^\s*RESTORE\s+(?:TABLE\s+)?{_IDENT}\s+(?:TO\s+)?"
    r"VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_RESTORE_TS_RE = re.compile(
    rf"^\s*RESTORE\s+(?:TABLE\s+)?{_IDENT}\s+(?:TO\s+)?"
    r"TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$",
    re.IGNORECASE,
)
# ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c, ... | FOR ALL COLUMNS]
_ANALYZE_RE = re.compile(
    rf"^\s*ANALYZE\s+TABLE\s+{_IDENT}\s+COMPUTE\s+STATISTICS"
    r"(?:\s+FOR\s+(ALL\s+COLUMNS|COLUMNS\s+([^;]+?)))?\s*;?\s*$",
    re.IGNORECASE,
)


def _ident_parts(ident: str) -> list[str]:
    return [
        p[1:-1] if p.startswith("`") else p
        for p in re.findall(r"`[^`]+`|[\w]+", ident)
    ]


def execute_dml(spark: SparkSession, sql_text: str):
    """Parse and execute one mutation/maintenance statement against a
    versioned table.

    ``MERGE INTO`` / ``DELETE FROM`` / ``UPDATE`` / ``ALTER TABLE``
    (ADD/RENAME/DROP COLUMN, ADD/DROP CONSTRAINT ... CHECK) go through
    Spark's parser and return the operation's result dict (at minimum
    the new ``version``). The Delta-extension statements Spark's parser
    lacks are shape-matched here: ``OPTIMIZE t [ZORDER BY (c, ...)]`` →
    ``compact()``; ``VACUUM t [RETAIN n HOURS] [DRY RUN]`` →
    ``vacuum()``; ``RESTORE [TABLE] t [TO] VERSION AS OF n`` →
    ``restore()``; ``DESCRIBE HISTORY t`` → the commit history as a
    DataFrame. Any other statement raises UnsupportedSqlError — route
    it to ``spark.sql`` instead."""
    m = _OPTIMIZE_RE.match(sql_text)
    if m:
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        where = _parse_optimize_where(m.group(2)) if m.group(2) else None
        zorder = (
            [c.strip().strip("`") for c in m.group(3).split(",")]
            if m.group(3)
            else None
        )
        # versioned.optimize.smallFileBytes (Delta optimize.minFileSize
        # analog): plain OPTIMIZE re-packs only small/DV-carrying files
        # — O(debt), not O(table). ZORDER is a layout change and stays
        # a full rewrite (of the WHERE-selected range, when scoped).
        small = table.properties().get("versioned.optimize.smallFileBytes")
        try:
            version = table.compact(
                zorder_by=zorder,
                small_file_bytes=int(small)
                if small is not None and not zorder
                else None,
                where=where,
            )
        except ValueError as e:
            # unknown/stat-less WHERE column etc. — SQL callers get the
            # module's loud-failure type
            raise UnsupportedSqlError(str(e)) from None
        return {"version": version}
    m = _VACUUM_RE.match(sql_text)
    if m:
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        # Delta's default retention window when RETAIN is omitted
        hours = float(m.group(2)) if m.group(2) else 168.0
        return table.vacuum(retain_hours=hours, dry_run=bool(m.group(3)))
    m = _REORG_RE.match(sql_text)
    if m:
        # Delta's REORG TABLE t APPLY (PURGE): rewrite only the files
        # carrying deletion vectors or dropped-column bytes — O(debt)
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        return {"version": table.reorg_purge()}
    m = _SHOW_CREATE_RE.match(sql_text)
    if m:
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        return spark.createDataFrame(
            [(_show_create_stmt(table),)], "createtab_stmt string"
        )
    m = _COPY_INTO_RE.match(sql_text)
    if m:
        # Delta's COPY INTO: idempotent bulk file ingestion
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        copy_opts = {
            k.lower(): v for k, v in _quoted_kv(m.group(6)).items()
        }
        try:
            return table.copy_into(
                m.group(2),
                file_format=m.group(3),
                pattern=m.group(4),
                force=copy_opts.get("force", "").lower() == "true",
                merge_schema=copy_opts.get("mergeschema", "").lower()
                == "true",
                options=_quoted_kv(m.group(5)) or None,
            )
        except ValueError as e:
            raise UnsupportedSqlError(str(e)) from None
    m = _HISTORY_RE.match(sql_text)
    if m:
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        return spark.createDataFrame(
            [
                (c.version, c.op, float(c.ts), len(c.files), len(c.dv_files))
                for c in reversed(table.history())
            ],
            "version bigint, operation string, timestamp double, "
            "num_files bigint, num_dv_files bigint",
        )
    m = _DETAIL_RE.match(sql_text)
    if m:
        # Delta's DESCRIBE DETAIL: one-row table summary. numFiles /
        # sizeInBytes come from the latest commit's file list + os.stat
        # (metadata only, no data scan).
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        c = table.get_commit()

        def _sz(f: str) -> int:
            try:
                return os.path.getsize(f)
            except OSError:
                return 0

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=32) as ex:  # I/O-bound stats
            size = sum(ex.map(_sz, c.files))
        first = table.get_commit(0)
        proto = c.protocol or {}
        tstats = table.table_statistics()
        return spark.createDataFrame(
            [
                (
                    "versioned",
                    table.path,
                    int(c.version),
                    float(first.ts),
                    float(c.ts),
                    len(c.files),
                    int(size),
                    len(c.dv_files),
                    len(table.schema().fields),
                    int(proto.get("min_reader", 1)),
                    int(proto.get("min_writer", 1)),
                    list(proto.get("reader_features") or []),
                    list(proto.get("writer_features") or []),
                    sorted(table.identity_columns()),
                    table.not_null_columns(),
                    None if tstats is None else int(tstats["row_count"]),
                    None
                    if tstats is None
                    else int(tstats["analyzed_version"]),
                    sorted(tstats["columns"]) if tstats else [],
                    table.current_row_count(c),
                    # stats freshness in one flag: exact metadata-
                    # derived count available, OR the ANALYZE record
                    # describes exactly this version
                    table.current_row_count(c) is not None
                    or (
                        tstats is not None
                        and int(tstats["analyzed_version"]) == int(c.version)
                    ),
                    table.partition_columns(),
                )
            ],
            "format string, location string, version bigint, "
            "created_at double, last_modified double, num_files bigint, "
            "size_in_bytes bigint, num_dv_files bigint, num_columns bigint, "
            "min_reader_version bigint, min_writer_version bigint, "
            "reader_features array<string>, writer_features array<string>, "
            "identity_columns array<string>, not_null_columns array<string>, "
            "analyzed_row_count bigint, analyzed_version bigint, "
            "analyzed_columns array<string>, current_row_count bigint, "
            "row_count_fresh boolean, partition_columns array<string>",
        )
    m = _RESTORE_RE.match(sql_text)
    if m:
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        return {"version": table.restore(int(m.group(2)))}
    m = _RESTORE_TS_RE.match(sql_text)
    if m:
        # Delta's RESTORE ... TIMESTAMP AS OF: resolve to the last
        # version committed at or before the timestamp, then restore
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        return {
            "version": table.restore(table.version_at(m.group(2)))
        }
    m = _ANALYZE_RE.match(sql_text)
    if m:
        # ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS ... | FOR ALL
        # COLUMNS] → analyze(): one distributed aggregate, persisted
        # metadata-only (see VersionedTable.analyze)
        table = resolve_versioned(spark, _ident_parts(m.group(1)))
        # whitespace-normalized: "FOR ALL  COLUMNS" (any run of spaces)
        # must hit the ALL branch, not fall through to a None group
        clause = re.sub(r"\s+", " ", (m.group(2) or "").strip())
        if clause.upper() == "ALL COLUMNS":
            cols = [f.name for f in table.schema().fields]
        elif clause:
            cols = [c.strip().strip("`") for c in m.group(3).split(",")]
        else:
            cols = None
        return table.analyze(columns=cols)
    m = _CONVERT_RE.match(sql_text)
    if m:
        # Delta's CONVERT TO DELTA parquet.`/path` — in-place adoption
        t = VersionedTable.convert(spark, m.group(1))
        return {"version": 0, "path": t.path}
    m = _CLONE_RE.match(sql_text)
    if m:
        dest_parts = _ident_parts(m.group(1))
        if len(dest_parts) != 2 or dest_parts[0].lower() != "versioned":
            raise UnsupportedSqlError(
                "CLONE destination must be `versioned.`/abs/path`` — "
                "clone to a path, then .register(db, table) for catalog "
                "addressing"
            )
        src = resolve_versioned(spark, _ident_parts(m.group(3)))
        shallow = (m.group(2) or "SHALLOW").upper() == "SHALLOW"
        version = int(m.group(4)) if m.group(4) else None
        t = src.clone(dest_parts[1], shallow=shallow, version=version)
        return {"version": 0, "path": t.path}
    if re.match(
        r"^\s*(OPTIMIZE|VACUUM|DESC(RIBE)?\s+(HISTORY|DETAIL)"
        r"|RESTORE|CONVERT|ANALYZE|REORG|COPY)\b",
        sql_text,
        re.IGNORECASE,
    ):
        raise UnsupportedSqlError(
            "statement shape not recognized — supported forms: "
            "OPTIMIZE t [ZORDER BY (c, ...)], VACUUM t [RETAIN n HOURS], "
            "DESCRIBE HISTORY t, DESCRIBE DETAIL t, "
            "RESTORE [TABLE] t [TO] VERSION AS OF n, "
            "REORG TABLE t APPLY (PURGE), "
            "COPY INTO t FROM '/path' FILEFORMAT = PARQUET "
            "[PATTERN = '*.parquet'] [FORMAT_OPTIONS('k'='v')] "
            "[COPY_OPTIONS('force'='true','mergeSchema'='true')], "
            "CONVERT TO VERSIONED parquet.`/path`, "
            "ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c, ...]"
        )
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql_text)
    kind = _cls(plan)
    if kind == "MergeIntoTable":
        try:
            wse = bool(plan.withSchemaEvolution())
        except Exception:  # older plan shape without the clause
            wse = False
        if wse:
            # merge() already evolves schema by default; the explicit
            # clause would imply Delta's stricter opt-in semantics
            raise UnsupportedSqlError(
                "WITH SCHEMA EVOLUTION clause is unsupported (schema "
                "evolution is the merge API's default behavior)"
            )
        return _execute_merge(spark, plan, sql_text)
    if kind == "DeleteFromTable":
        return _execute_delete(spark, plan)
    if kind == "UpdateTable":
        return _execute_update(spark, plan)
    if kind == "InsertIntoStatement":
        return _execute_insert(spark, plan)
    if kind == "CreateTableAsSelect":
        return _execute_ctas(spark, plan)
    if kind == "CreateTable":
        return _execute_create_table(spark, plan)
    if kind in (
        "AddColumns",
        "RenameColumn",
        "DropColumns",
        "AddCheckConstraint",
        "DropConstraint",
        "AlterColumns",
    ):
        return _execute_alter(spark, plan, kind)
    if kind == "SetTableProperties":
        _, parts = _relation_parts_table(plan.table())
        table = resolve_versioned(spark, parts)
        props = {}
        it = plan.properties().iterator()
        while it.hasNext():
            t = it.next()
            props[t._1()] = t._2()
        table.set_properties(props)
        return {"properties": table.properties()}
    if kind == "UnsetTableProperties":
        _, parts = _relation_parts_table(plan.table())
        table = resolve_versioned(spark, parts)
        keys = [k for k in _seq(plan.propertyKeys())]
        if plan.ifExists():
            keys = [k for k in keys if k in table.properties()]
        if keys:
            table.unset_properties(keys)
        return {"properties": table.properties()}
    if kind == "ShowTableProperties":
        node = plan.table() if hasattr(plan, "table") else plan.child()
        _, parts = _relation_parts_table(node)
        table = resolve_versioned(spark, parts)
        return spark.createDataFrame(
            sorted(table.properties().items()) or [],
            "key string, value string",
        )
    if _TIME_TRAVEL_RX.search(sql_text) or _TABLE_CHANGES_RX.search(sql_text):
        # read-side time travel / CDC: a SELECT whose FROM carries
        # VERSION AS OF / TIMESTAMP AS OF or table_changes(...) on a
        # versioned table
        return execute_query(spark, sql_text)
    raise UnsupportedSqlError(
        f"statement parses to {kind}, which this dispatcher does not "
        "execute — only MERGE INTO / DELETE FROM / UPDATE / ALTER TABLE "
        "(columns, CHECK constraints) / OPTIMIZE / VACUUM / RESTORE / "
        "DESCRIBE HISTORY / SELECT ... VERSION|TIMESTAMP AS OF on "
        "versioned tables; run plain queries through spark.sql"
    )


_TIME_TRAVEL_RX = re.compile(
    rf"{_IDENT}\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"('(?:[^']|'')*'|\d+(?:\.\d+)?)",
    re.IGNORECASE,
)
# Delta's read-side CDC table function: table_changes('t', from[, to]),
# bounds INCLUSIVE on both ends; each bound is a version int or a
# quoted timestamp (our change_feed API is exclusive-start, so from
# maps to starting_version=from-1). Timestamp bounds are well-defined
# because commits stamp monotone in-commit timestamps.
_TABLE_CHANGES_RX = re.compile(
    r"table_changes\s*\(\s*'([^']+)'\s*,\s*"
    r"(\d+|'(?:[^']|'')*')\s*(?:,\s*(\d+|'(?:[^']|'')*')\s*)?\)",
    re.IGNORECASE,
)


def _tc_bound(table, raw: str | None, end: bool) -> int | None:
    """A table_changes bound → inclusive commit version. Ints are
    versions; quoted values are timestamps (ISO-8601 or epoch
    seconds): the START bound resolves to the FIRST commit at-or-after
    (Delta's startingTimestamp rule — raises if that's past the latest
    commit), the END bound to the LAST commit at-or-before
    (``version_at``, Delta's endingTimestamp rule)."""
    if raw is None:
        return None
    if raw.isdigit():
        return int(raw)
    s = raw[1:-1].replace("''", "'")
    ts = float(s) if re.fullmatch(r"\d+(\.\d+)?", s) else s
    if end:
        return table.version_at(ts)
    from .tables import _as_epoch

    t = _as_epoch(ts)
    for c in table.history():
        if float(c.ts) >= t:
            return c.version
    raise ValueError(
        f"table_changes starting timestamp {s!r} is after the latest "
        "commit — no changes exist there yet"
    )


def execute_query(spark: SparkSession, sql_text: str) -> DataFrame:
    """Read-side SQL time travel + CDC: run a query whose FROM clause
    uses ``VERSION AS OF n`` / ``TIMESTAMP AS OF ts`` or
    ``table_changes('t', from[, to])`` (Delta's CDC table function;
    bounds inclusive on both ends, each a version int or a quoted
    timestamp) on versioned tables — the analog
    of the reference probing
    ``CHANGE_TRACKING_CURRENT_VERSION()`` (COPY_MSQL_TO_SILVER.py:
    128-129) and the read-side counterpart of this module's DML surface.

    Each time-traveled relation (``versioned.`/path``` or a
    ``register()``-ed catalog name) is resolved through
    ``VersionedTable.read(version=/timestamp=)`` and substituted with a
    session temp view; the rewritten statement then runs through
    ``spark.sql`` unchanged, so projections/joins/aggregations keep
    Spark's full grammar and Catalyst planning (snapshot pruning and
    scan pushdown happen inside ``read()``'s plan exactly as in API
    time travel). TIMESTAMP AS OF resolves to the last version
    committed at or before the timestamp — Delta's rule
    (``tables.version_at``)."""
    # spans of single-quoted literals: clause matches inside them are
    # string CONTENT, not syntax — never rewrite those
    literal_spans = [
        m.span() for m in re.finditer(r"'(?:[^']|'')*'", sql_text)
    ]

    def _in_literal(pos: int) -> bool:
        return any(a < pos < b for a, b in literal_spans)

    subs: list[tuple[int, int, DataFrame]] = []
    for m in _TIME_TRAVEL_RX.finditer(sql_text):
        if _in_literal(m.start()):
            continue
        rel, kind, val = m.group(1), m.group(2).upper(), m.group(3)
        table = resolve_versioned(spark, _ident_parts(rel))
        if kind == "VERSION":
            if not val.isdigit():
                raise UnsupportedSqlError(
                    f"VERSION AS OF takes an integer version, got {val!r}"
                )
            df = table.read(version=int(val))
        else:
            ts = (
                val[1:-1].replace("''", "'")
                if val.startswith("'")
                else float(val)
            )
            df = table.read(timestamp=ts)
        subs.append((m.start(), m.end(), df))
    for m in _TABLE_CHANGES_RX.finditer(sql_text):
        if _in_literal(m.start()):
            continue
        name = m.group(1)
        parts = [name] if name.startswith("/") else _ident_parts(name)
        table = (
            VersionedTable(spark, name)
            if name.startswith("/")
            else resolve_versioned(spark, parts)
        )
        from_v = _tc_bound(table, m.group(2), end=False)
        to_v = _tc_bound(table, m.group(3), end=True)
        # Delta's table_changes is INCLUSIVE of from_v; the API is
        # exclusive-start
        df = table.change_feed(starting_version=from_v - 1)
        if to_v is not None:
            df = df.filter(F.col("_commit_version") <= int(to_v))
        subs.append((m.start(), m.end(), df))
    if not subs:
        raise UnsupportedSqlError(
            "no VERSION AS OF / TIMESTAMP AS OF / table_changes(...) "
            "clause found — run plain queries through spark.sql"
        )
    subs.sort()
    out: list[str] = []
    last = 0
    for n, (start, end, df) in enumerate(subs):
        if start < last:
            raise UnsupportedSqlError(
                "overlapping time-travel/table_changes clauses"
            )
        view = f"__versioned_read_{n}_{abs(hash(sql_text)) % 10**8}"
        df.createOrReplaceTempView(view)
        out.append(sql_text[last:start])
        out.append(view)
        last = end
    return spark.sql("".join(out) + sql_text[last:])


def _execute_insert(spark: SparkSession, plan) -> dict:
    """INSERT INTO → append(); INSERT OVERWRITE → overwrite(). Standard
    SQL positional semantics: the query's columns map to the table's
    schema order (or to an explicit ``(col, ...)`` list); arity
    mismatches fail loudly. Partition-spec inserts are unsupported
    (the format's layout is file-statistic clustering, not Hive
    partition dirs)."""
    if plan.partitionSpec().size() or plan.ifPartitionNotExists():
        raise UnsupportedSqlError(
            "INSERT ... PARTITION is unsupported — the versioned format "
            "clusters by file statistics (OPTIMIZE ZORDER BY), not "
            "Hive partition directories"
        )
    _, parts = _relation_parts(plan.table())
    table = resolve_versioned(spark, parts)
    df = _plan_df(spark, plan.query())
    user_cols = _seq(plan.userSpecifiedCols())
    if user_cols:
        known = {f.name for f in table.schema().fields}
        unknown = [c for c in user_cols if c not in known]
        if unknown:
            # without this, append()'s schema evolution would silently
            # CREATE a misspelled column instead of raising
            raise UnsupportedSqlError(
                f"INSERT column(s) {unknown} not in target schema "
                f"{sorted(known)}"
            )
    target_cols = user_cols or [f.name for f in table.schema().fields]
    if len(df.columns) != len(target_cols):
        ident = sorted(table.identity_columns())
        hint = (
            f" — {ident} are GENERATED ALWAYS AS IDENTITY; list the "
            f"non-identity columns explicitly, e.g. INSERT INTO t "
            f"({', '.join(c for c in target_cols if c not in ident)}) ..."
            if not user_cols
            and ident
            and len(df.columns) == len(target_cols) - len(ident)
            else ""
        )
        raise UnsupportedSqlError(
            f"INSERT arity mismatch: query produces {len(df.columns)} "
            f"column(s), target list has {len(target_cols)}{hint}"
        )
    df = df.toDF(*target_cols)
    if plan.overwrite():
        return {"version": table.overwrite(df)}
    return {"version": table.append(df)}


def _partitioning_cols(plan) -> list[str]:
    """PARTITIONED BY column names from a CreateTable/CTAS plan —
    identity transforms only (bucket/days/... have no versioned-table
    analog; the engine's clustered compact covers those layouts)."""
    out: list[str] = []
    part = plan.partitioning()
    for i in range(part.size()):
        tr = part.apply(i)
        if tr.getClass().getSimpleName() != "IdentityTransform":
            raise UnsupportedSqlError(
                f"unsupported PARTITIONED BY transform {tr.describe()!r}"
                " — only plain column partitioning is supported"
            )
        out.append(tr.describe())
    return out


def _execute_create_table(spark: SparkSession, plan) -> dict:
    """Column-defined CREATE TABLE — including the reference's
    ``Id BIGINT GENERATED ALWAYS AS IDENTITY`` shape
    (``/root/reference/dbrdemo.sql:20``, ``dbrconfig.sql:21,34``).
    Builds an EMPTY versioned table at the path with the declared
    schema; identity specs (ALWAYS and BY DEFAULT) map to
    commit-arbitrated identity columns — kept at their DECLARED
    position and implicitly NOT NULL, like Delta — and ``GENERATED
    ALWAYS AS (expr)`` columns map to the generated-column registry.
    DEFAULT expressions are validated BEFORE the table is created (the
    same resolve/cast probe ``set_column_default`` runs), and any
    post-create declaration failure removes the partially-created
    table, so a corrected re-run never hits 'already exists'."""
    name_parts = _seq(plan.name().nameParts())
    if len(name_parts) != 2 or name_parts[0].lower() != "versioned":
        raise UnsupportedSqlError(
            "CREATE TABLE supports only `CREATE TABLE "
            "versioned.`/abs/path`` (col type ..., ...)` — create at a "
            "path, then .register(db, table) for catalog addressing"
        )
    provider = None
    try:
        provider = _opt(plan.tableSpec().provider())
    except Exception:
        pass
    if provider is not None and provider.lower() != "versioned":
        raise UnsupportedSqlError(
            f"USING {provider} conflicts with the versioned.`path` target"
        )
    root = name_parts[1]
    if VersionedTable.exists(root):
        if plan.ignoreIfExists():
            return {"version": VersionedTable(spark, root).latest_version()}
        raise ValueError(f"versioned table already exists at {root!r}")
    cols = plan.columns()
    fields: list = []
    declared_order: list[str] = []
    identity: dict = {}
    generated: dict = {}
    not_null: list = []
    defaults: dict = {}
    for i in range(cols.size()):
        c = cols.apply(i)
        dt = T._parse_datatype_json_string(c.dataType().json())
        declared_order.append(c.name())
        spec = c.identityColumnSpec()
        if spec.isDefined():
            s = spec.get()
            if not isinstance(dt, T.LongType):
                raise UnsupportedSqlError(
                    f"identity column {c.name()!r} must be BIGINT, "
                    f"is {dt.simpleString()}"
                )
            identity[c.name()] = {
                "start": int(s.getStart()),
                "step": int(s.getStep()),
                "mode": "default" if s.isAllowExplicitInsert() else "always",
            }
            # implicitly NOT NULL (Delta/reference parity) — enforced
            # via the same write-gated constraint as a declared one
            not_null.append(c.name())
            continue  # assigned by create(); never part of the body df
        fields.append(T.StructField(c.name(), dt, True))
        if not c.nullable():
            not_null.append(c.name())
        ge = c.generationExpression()
        if ge.isDefined():
            generated[c.name()] = str(ge.get())
        dv = c.defaultValue()
        if dv.isDefined():
            defaults[c.name()] = str(dv.get().originalSQL())
    body = T.StructType(fields)
    by_name = {f.name: f for f in fields}
    # pre-validate everything validate-able BEFORE the table exists:
    # a bad DEFAULT/generation expression then fails with NO partial
    # table left behind (ALTER-time declarations re-validate anyway)
    both = sorted(set(generated) & set(defaults))
    if both:
        raise UnsupportedSqlError(
            f"column(s) {both} declare both GENERATED ALWAYS AS and "
            "DEFAULT — a generated column's value is always computed, "
            "a DEFAULT would never apply"
        )
    for n, e in defaults.items():
        # self-contained (column-free) resolve + cast check — the exact
        # probe set_column_default runs at declare time
        spark.range(1).select(F.expr(e).cast(by_name[n].dataType)).schema
    # generation expressions may reference sibling BODY columns only:
    # the write path fills generated columns BEFORE identity assignment,
    # so an identity-referencing expression would pass CREATE and then
    # explode on the first append — refuse it HERE with the reason
    for n, e in generated.items():
        try:
            spark.createDataFrame([], body).select(F.expr(e)).schema
        except Exception as err:
            named = [
                i
                for i in identity
                if re.search(rf"\b{re.escape(i)}\b", e)
            ]
            if named:
                raise UnsupportedSqlError(
                    f"generated column {n!r} references identity "
                    f"column(s) {named} — identity values are assigned "
                    "AFTER generated columns are computed, so the "
                    "expression can never resolve at write time"
                ) from None
            raise err
    df = spark.createDataFrame([], body)
    # a CREATE against a PRE-EXISTING directory (landing dir adopted as
    # a table path) must never destroy its other contents on failure —
    # remember what was there so cleanup removes only what WE created
    pre_entries = set(os.listdir(root)) if os.path.isdir(root) else None
    t = VersionedTable.create(
        spark,
        root,
        df,
        identity=identity or None,
        column_order=declared_order if identity else None,
        partition_by=_partitioning_cols(plan) or None,
    )
    try:
        for n, e in generated.items():
            t.add_generated_column(n, e)
        for n in not_null:
            # declared NOT NULL → the write-gated column constraint
            # (flips the committed schema and registers the IS NULL
            # probe)
            t.set_not_null(n)
        for n, e in defaults.items():
            t.set_column_default(n, e)
    except Exception:
        # the table was born in THIS call — remove the partial state so
        # the corrected statement can re-run, but ONLY the entries this
        # call added (the directory may have pre-existed with user data)
        if pre_entries is None:
            shutil.rmtree(root, ignore_errors=True)
        else:
            for entry in set(os.listdir(root)) - pre_entries:
                p = os.path.join(root, entry)
                try:
                    if os.path.isdir(p):
                        shutil.rmtree(p, ignore_errors=True)
                    else:
                        os.remove(p)
                except OSError:
                    pass
        raise
    return {"version": t.latest_version()}


def _execute_ctas(spark: SparkSession, plan) -> dict:
    """CREATE TABLE versioned.`/path` AS SELECT → VersionedTable.create
    (IF NOT EXISTS honored). Only path addressing: a CTAS into the
    session catalog would be a plain Spark table, not a versioned one —
    create then register() for name addressing."""
    name_parts = _seq(plan.name().nameParts())
    if len(name_parts) != 2 or name_parts[0].lower() != "versioned":
        raise UnsupportedSqlError(
            "CTAS supports only `CREATE TABLE versioned.`/abs/path`` AS "
            "SELECT ...` — create at a path, then .register(db, table) "
            "for catalog addressing"
        )
    provider = None
    try:
        provider = _opt(plan.tableSpec().provider())
    except Exception:
        pass
    if provider is not None and provider.lower() != "versioned":
        raise UnsupportedSqlError(
            f"USING {provider} conflicts with the versioned.`path` target"
        )
    root = name_parts[1]
    if VersionedTable.exists(root):
        if plan.ignoreIfExists():
            return {"version": VersionedTable(spark, root).latest_version()}
        raise ValueError(f"versioned table already exists at {root!r}")
    df = _plan_df(spark, plan.query())
    VersionedTable.create(
        spark, root, df, partition_by=_partitioning_cols(plan) or None
    )
    return {"version": 0}


def _field_name(unresolved_field) -> str:
    parts = _seq(unresolved_field.name())
    if len(parts) != 1:
        raise UnsupportedSqlError(
            f"nested field {'.'.join(parts)!r} unsupported — versioned "
            "tables evolve top-level columns only"
        )
    return parts[0]


def _execute_alter(spark: SparkSession, plan, kind: str) -> dict:
    """ALTER TABLE → schema-evolution / constraint API. Column DDL maps
    onto the id-mapped evolution primitives (each column op is its own
    metadata-only commit, exactly like the Python API); CHECK
    constraints go to the write-gating constraint registry."""
    if kind == "AddCheckConstraint":
        cc = plan.checkConstraint()
        # the parsed child is the validation plan (Filter over the
        # relation); unwrap to the table reference underneath
        node = plan.child()
        while _cls(node) in ("Filter", "SubqueryAlias", "Project"):
            node = node.child()
        _, parts = _relation_parts_table(node)
        table = resolve_versioned(spark, parts)
        table.add_constraint(cc.name(), cc.condition())
        return {"constraint": cc.name()}
    _, parts = _relation_parts_table(plan.table())
    table = resolve_versioned(spark, parts)
    if kind == "AddColumns":
        version = None
        for c in _seq(plan.columnsToAdd()):
            name_parts = _seq(c.name())
            if len(name_parts) != 1:
                raise UnsupportedSqlError(
                    f"nested column {'.'.join(name_parts)!r} unsupported"
                )
            for opt_attr in ("position", "default", "comment"):
                try:
                    if _opt(getattr(c, opt_attr)()) is not None:
                        raise UnsupportedSqlError(
                            f"ADD COLUMN {opt_attr.upper()} clause unsupported"
                        )
                except AttributeError:
                    pass
            version = table.add_column(
                name_parts[0], c.dataType().simpleString()
            )
        if version is None:
            raise UnsupportedSqlError("ADD COLUMNS lists no columns")
        return {"version": version}
    if kind == "RenameColumn":
        return {
            "version": table.rename_column(
                _field_name(plan.column()), plan.newName()
            )
        }
    if kind == "DropColumns":
        version = None
        for f in _seq(plan.columnsToDrop()):
            name = _field_name(f)
            try:
                version = table.drop_column(name)
            except (KeyError, ValueError):
                if not plan.ifExists():
                    raise
        return {"version": version}
    if kind == "AlterColumns":
        # SET/DROP NOT NULL, SET/DROP DEFAULT, and TYPE <wider> map onto
        # the engine (TYPE is metadata-only widening — see
        # widen_column_type; comments/positions are cosmetic catalog
        # state the versioned format doesn't carry)
        did = 0
        for s in _seq(plan.specs()):
            col_parts = _seq(s.column().name())
            if len(col_parts) != 1:
                raise UnsupportedSqlError(
                    f"nested column {'.'.join(col_parts)!r} unsupported"
                )
            col = col_parts[0]
            nn = _opt(s.newNullability())
            nd = None
            drop_default = False
            try:
                nd = _opt(s.newDefaultExpression())
                drop_default = bool(s.dropDefault())
            except AttributeError:
                pass
            nt = None
            try:
                nt = _opt(s.newDataType())
            except AttributeError:
                pass
            others = []
            for attr in ("newComment", "newPosition"):
                try:
                    if _opt(getattr(s, attr)()) is not None:
                        others.append(attr)
                except AttributeError:
                    pass
            if others or (
                nn is None and nd is None and nt is None and not drop_default
            ):
                raise UnsupportedSqlError(
                    "ALTER COLUMN supports only TYPE <wider-type> / SET "
                    "NOT NULL / DROP NOT NULL / SET DEFAULT expr / DROP "
                    f"DEFAULT (got {others or 'no supported change'})"
                )
            if nt is not None:
                try:
                    table.widen_column_type(col, nt.simpleString())
                except ValueError as e:
                    raise UnsupportedSqlError(str(e)) from None
                did += 1
            if nn is not None:
                (table.set_not_null if not nn else table.drop_not_null)(col)
                did += 1
            if nd is not None:
                table.set_column_default(col, str(nd.originalSQL()))
                did += 1
            elif drop_default:
                table.drop_column_default(col)
                did += 1
        if not did:
            raise UnsupportedSqlError("ALTER COLUMN lists no columns")
        return {"version": table.latest_version()}
    if kind == "DropConstraint":
        name = plan.name()
        if name not in table.constraints():
            if plan.ifExists():
                return {"constraint": name}
            raise ValueError(f"no CHECK constraint named {name!r}")
        table.drop_constraint(name)
        return {"constraint": name}
    raise UnsupportedSqlError(f"unhandled ALTER kind {kind}")


def _relation_parts_table(node) -> tuple[str | None, list[str]]:
    """Like _relation_parts but for UnresolvedTable / UnresolvedTableOrView
    (ALTER / SHOW TBLPROPERTIES target) nodes."""
    if _cls(node) in ("UnresolvedTable", "UnresolvedTableOrView"):
        return None, _seq(node.multipartIdentifier())
    return _relation_parts(node)
