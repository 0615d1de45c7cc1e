"""Data profiling (SURVEY.md §2.5 G7 / §1.1 "data_info").

Mirrors the reference's profile record (doc.py:104-110) — same keys, same
shapes — so the prompt builder and formatter consume it unchanged:

    {"行数": n, "列数": n, "列名": [...], "数据类型": {col: dtype},
     "前5行数据": [row-dicts], "table_name": <registered view>}

Differences, by design:
  * dtypes are Spark simpleString names (bigint/double/string/...), not
    pandas dtype strings — the engine's real types;
  * ``table_name`` replaces the reference's ``db_path`` (per-file .duckdb
    file, doc.py:113-119): the Spark-native equivalent of a persisted
    per-file table is a registered temp view over a shared session.

Scale note: ``count()`` is a full-scan aggregate and ``limit(5)`` a
cheap head; both are distributed actions — no driver materialization of
the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _json_safe(v):
    # the profile travels through json.dumps (metadata.save_file_info),
    # flask jsonify, and the NL prompt — Spark rows carry date/datetime/
    # Decimal/bytearray scalars none of those accept, so normalize here
    # (date-typed CSV uploads 500'd the /api/upload route before this)
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def profile_dataframe(df: DataFrame) -> dict:
    head = [_json_safe(row.asDict()) for row in df.limit(5).collect()]
    return {
        "行数": df.count(),
        "列数": len(df.columns),
        "列名": list(df.columns),
        "数据类型": dict(df.dtypes),
        "前5行数据": head,
    }
