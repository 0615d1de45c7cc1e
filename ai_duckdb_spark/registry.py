"""Per-file table registry (SURVEY.md §2.2 K1).

The reference isolates每个上传文件 in its own on-disk DuckDB database and
always names the table ``data_table`` (doc.py:113-119, prompt rule
doc.py:184). The Spark-native equivalent: one shared SparkSession, one
temp view per file id (isolation), plus a ``data_table`` alias pointing
at the active file (the name the NL→SQL prompt promises).

Temp views are catalog metadata over lazy plans — registering N files
costs nothing until a query runs, unlike the reference's eager
full-table CTAS copy (SURVEY.md §4 "eager full materialization").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

ACTIVE_VIEW = "data_table"


def _view_name(file_id: str) -> str:
    return f"data_table_{re.sub(r'[^A-Za-z0-9_]', '_', file_id)}"


class TableRegistry:
    """Tracks per-file temp views and the active ``data_table`` alias."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._files: dict[str, str] = {}
        self._active: str | None = None

    def register(self, file_id: str, df: DataFrame, activate: bool = True) -> str:
        view = _view_name(file_id)
        df.createOrReplaceTempView(view)
        self._files[file_id] = view
        if activate:
            self.activate(file_id)
        return view

    def activate(self, file_id: str) -> None:
        """Point the prompt-visible ``data_table`` name at this file."""
        view = self._files[file_id]
        self.spark.table(view).createOrReplaceTempView(ACTIVE_VIEW)
        self._active = file_id

    @property
    def active_file(self) -> str | None:
        return self._active

    def view_for(self, file_id: str) -> str | None:
        return self._files.get(file_id)

    def drop(self, file_id: str) -> None:
        view = self._files.pop(file_id, None)
        if view:
            self.spark.catalog.dropTempView(view)
        if self._active == file_id:
            self._active = None
