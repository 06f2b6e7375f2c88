"""Python UDTF (Spark 4) — the row→rows extensibility escape hatch.

The engine's chunker (``textstats.q_text_chunks``) is pure Catalyst and
is the scale path. This module re-implements it as a Python UDTF applied
via ``LATERAL`` — deliberately the same semantics, so the DuckDB oracle
that checks the Catalyst version checks the UDTF version too, proving
the extension mechanism end-to-end (SURVEY.md §2.2 'UDF/UDAF/UDTF' row).

When to actually use a UDTF at 100 TB: per-row expansion whose logic
cannot be expressed in Catalyst expressions — a real BPE tokenizer, a
document-structure parser, a decoder emitting variable record counts.
The chunker here is the harness; swap ``eval`` for the real logic. The
Python boundary costs ~10-100× over codegen for expressible logic —
never move work here that ``transform``/``posexplode`` can do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..sources.catalog import load_table
from .helpers import fan_out
from .textstats import CHUNK_LEN, CHUNK_STRIDE, ORACLE_TEXT_CHUNKS


@udtf(returnType="chunk_id bigint, chunk_text string, n_chars bigint")
class ChunkerUdtf:
    """Overlapping fixed-size chunks; 0-based chunk_id, mirroring the
    Catalyst ``posexplode`` formulation exactly."""

    def eval(self, text: str):
        if text is None:
            # mirror the Catalyst twin: greatest(length(NULL),1)=1 keeps
            # one row whose substring/length are NULL — the UDTF must
            # agree so the shared oracle holds on NULL-text corpora
            yield 0, None, None
            return
        for idx, start in enumerate(range(0, max(len(text), 1), CHUNK_STRIDE)):
            chunk = text[start : start + CHUNK_LEN]
            yield idx, chunk, len(chunk)


def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunker as a LATERAL-applied Python UDTF. Same output (and
    same DuckDB oracle) as ``q_text_chunks``; exists to prove the UDTF
    path, not to replace the Catalyst one."""
    spark.udtf.register("engine_chunker", ChunkerUdtf)
    fan_out(load_table(spark, sf_dir, "documents"), spark).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_chars "
        "FROM __udtf_docs d, LATERAL engine_chunker(d.text) c"
    )


QUERIES = {"q_udtf_chunks": q_udtf_chunks}
ORACLES = {"q_udtf_chunks": ORACLE_TEXT_CHUNKS}
