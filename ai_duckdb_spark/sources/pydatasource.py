"""Spark-4 Python DataSource for the app's multi-format ingest surface
(`spark.read.format("aiduck")`): csv / json (three-tier fallback) /
parquet / xlsx / xls, one INPUT PARTITION PER FILE.

Why this exists next to sources/io.py: the reference (and io.py's
faithful port of it, doc.py:16-83) parses each upload ON THE DRIVER via
pandas — fine for one 16 MB upload, wrong for a directory of ten
thousand files. The DataSource moves the same parsing to EXECUTORS:
`partitions()` lists the files, `read()` parses one file per task and
streams Arrow batches back, so a directory ingest scales with the
cluster instead of the driver. Schema is inferred once from the first
file (driver-side, one file) and every partition coerces to it — the
standard multi-file contract.

The JSON tiers mirror the reference's precedence exactly (reference
doc.py:50-76): JSON-Lines → top-level array → manual shape rules
(list-of-dicts / dict-of-lists / single dict). The xlsx path uses the
same stdlib SpreadsheetML reader as io.py when openpyxl is absent.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pandas as pd
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SUPPORTED = (".csv", ".json", ".parquet", ".xlsx", ".xls")


def _read_pandas(path: str) -> pd.DataFrame:
    """SparkSession-free single-file reader (runs on executors)."""
    suffix = os.path.splitext(path)[1].lower()
    if suffix == ".csv":
        return pd.read_csv(path)
    if suffix == ".parquet":
        return pd.read_parquet(path)
    if suffix == ".xlsx":
        try:
            return pd.read_excel(path)  # engine present
        except ImportError:
            from .io import _read_xlsx_stdlib

            return _read_xlsx_stdlib(path)
    if suffix == ".xls":
        try:
            return pd.read_excel(path)  # xlrd present
        except ImportError:
            from .xls import read_xls_stdlib

            return read_xls_stdlib(path)
    if suffix == ".json":
        with open(path, encoding="utf-8") as f:
            text = f.read()
        first = text.lstrip()[:1]
        lines = [ln for ln in text.splitlines() if ln.strip()]
        # tier 1: JSON Lines — gated to multi-line object streams.
        # (pandas read_json(lines=True) silently accepts an ARRAY line
        # with positional 0..n columns, and a single-line dict-of-lists
        # as one row of list cells — both must fall through to the
        # whole-document tiers, reference precedence doc.py:50-76.)
        if first == "{" and len(lines) >= 2:
            try:
                df = pd.read_json(path, lines=True)
                if len(df.columns):
                    return df
            except ValueError:
                pass
        # tiers 2+3: whole-document shapes, reference precedence
        data = json.loads(text)
        if isinstance(data, list):
            return pd.DataFrame(data)
        if isinstance(data, dict):
            if all(isinstance(v, list) for v in data.values()):
                return pd.DataFrame(data)
            return pd.DataFrame([data])
        raise ValueError(f"unsupported JSON shape in {path}")
    raise ValueError(f"unsupported suffix: {suffix}")


def _spark_type(dtype) -> object:
    if pd.api.types.is_bool_dtype(dtype):
        return BooleanType()
    if pd.api.types.is_integer_dtype(dtype):
        return LongType()
    if pd.api.types.is_float_dtype(dtype):
        return DoubleType()
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return TimestampType()
    return StringType()


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.splitext(f)[1].lower() in SUPPORTED
        ]
    elif any(ch in path for ch in "*?["):
        files = _glob.glob(path)
    else:
        files = [path]
    files = sorted(f for f in files if os.path.splitext(f)[1].lower() in SUPPORTED)
    if not files:
        raise FileNotFoundError(f"no supported files at {path}")
    return files


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MultiFormatReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("aiduck: .load(path) is required")
        self._schema = schema

    def partitions(self):  # one task per file — the scale unit
        return [_FilePartition(p) for p in _list_files(self._path)]

    def read(self, partition):
        import pyarrow as pa

        pdf = _read_pandas(partition.path)
        # coerce to the inferred schema (missing columns -> NULL, extras
        # dropped, dtypes normalized) so every file agrees
        out = {}
        for field in self._schema.fields:
            col = pdf[field.name] if field.name in pdf.columns else pd.Series(
                [None] * len(pdf)
            )
            if isinstance(field.dataType, LongType):
                col = pd.to_numeric(col, errors="coerce").astype("Int64")
            elif isinstance(field.dataType, DoubleType):
                col = pd.to_numeric(col, errors="coerce").astype("float64")
            elif isinstance(field.dataType, BooleanType):
                col = col.astype("boolean")
            elif isinstance(field.dataType, TimestampType):
                col = pd.to_datetime(col, errors="coerce")
            else:
                col = col.astype(object).where(col.notna(), None).map(
                    lambda v: v if v is None else str(v)
                )
            out[field.name] = col
        table = pa.Table.from_pandas(
            pd.DataFrame(out), preserve_index=False
        )
        yield from table.to_batches()


class MultiFormatDataSource(DataSource):
    """`spark.dataSource.register(MultiFormatDataSource)` then
    `spark.read.format("aiduck").load(path_or_dir_or_glob)`."""

    @classmethod
    def name(cls) -> str:
        return "aiduck"

    def schema(self) -> StructType:
        first = _list_files(self.options.get("path"))[0]
        pdf = _read_pandas(first)
        return StructType(
            [StructField(str(c), _spark_type(pdf[c].dtype), True) for c in pdf.columns]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return MultiFormatReader(self.options, schema)
