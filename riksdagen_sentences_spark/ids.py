"""Deterministic canonical identifiers.

The reference assigns a *random* ``uuid.uuid4()`` per new sentence
(/root/reference/models/sentence.py:189-191) and auto-increment surrogate
keys everywhere else (models/crud/create.py:31-159).  Neither survives a
distributed, retryable, resumable pipeline: ids must be pure functions of
content.  Per the BASELINE.json north rule we use UUIDv5-STYLE identifiers
derived from sha256 (sha1 is unavailable in the DuckDB oracle, so the
digest is sha256 truncated to 128 bits with RFC-4122 version/variant bits
set - name-based, deterministic, collision-resistant).

Three parallel implementations, all guaranteed byte-identical:

- :func:`uuid5_py` - pure Python (unit tests, reference-semantics oracle)
- :func:`uuid5_col` - Spark ``Column`` expression (JVM-side, inside
  whole-stage codegen; NO Python UDF - ``monotonically_increasing_id`` is
  deliberately banned as non-deterministic under task retry)
- :func:`uuid5_sql` - DuckDB SQL snippet generator (driver oracle)

Entity names are joined with the ASCII unit separator (0x1f) which cannot
occur in cleaned text, so composite keys cannot collide by concatenation.

NULL handling is explicit and identical on all three sides: a NULL part is
encoded as the single byte 0x00 (which also cannot occur in cleaned text),
so ``uuid5_col('a', NULL, 'b')`` differs from ``uuid5_col('a', 'b')`` and
Spark and the DuckDB oracle agree on nullable key columns.  (Spark's
``concat_ws`` silently DROPS null parts and DuckDB's ``||`` propagates
NULL - without the sentinel the two sides would diverge.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"
NULL_SENTINEL = "\x00"
_VARIANT_TR_SRC = "0123456789abcdef"
_VARIANT_TR_DST = "89ab89ab89ab89ab"


def _format_uuid_from_hex(h: str) -> str:
    return (
        f"{h[0:8]}-{h[8:12]}-5{h[13:16]}-"
        f"{_VARIANT_TR_DST[_VARIANT_TR_SRC.index(h[16])]}{h[17:20]}-{h[20:32]}"
    )


def uuid5_py(*parts: str | None) -> str:
    """Pure-Python twin of :func:`uuid5_col` (tests + P/R oracle)."""
    name = SEP.join(NULL_SENTINEL if p is None else p for p in parts)
    h = hashlib.sha256(name.encode("utf-8")).hexdigest()
    return _format_uuid_from_hex(h)


def uuid5_col(*parts: Column | str) -> Column:
    """UUIDv5-style id as a pure Spark Column expression (no UDF)."""
    cols = [c if isinstance(c, Column) else F.col(c) for c in parts]
    h = F.sha2(
        F.concat_ws(
            SEP,
            *[
                F.coalesce(c.cast("string"), F.lit(NULL_SENTINEL))
                for c in cols
            ],
        ),
        256,
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(
            F.translate(F.substring(h, 17, 1), _VARIANT_TR_SRC, _VARIANT_TR_DST),
            F.substring(h, 18, 3),
        ),
        F.substring(h, 21, 12),
    )


def uuid5_sql(*part_exprs: str) -> str:
    """DuckDB SQL snippet computing the identical id from column exprs."""
    name = (" || chr(31) || ").join(
        f"COALESCE(CAST({e} AS VARCHAR), chr(0))" for e in part_exprs
    )
    h = f"sha256({name})"
    return (
        f"(substr({h},1,8) || '-' || substr({h},9,4) || '-5' || "
        f"substr({h},14,3) || '-' || "
        f"translate(substr({h},17,1),'{_VARIANT_TR_SRC}','{_VARIANT_TR_DST}') || "
        f"substr({h},18,3) || '-' || substr({h},21,12))"
    )
