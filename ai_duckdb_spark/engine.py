"""End-to-end engine facade (SURVEY.md §3 "Spark restatement").

The reference pipeline per entry point E1-E3:

    file → pandas → profile → per-file DuckDB CTAS → NL→SQL (Gemini)
         → fence strip → execute → records

restated Spark-first:

    file → spark.read (lazy) → profile → temp-view register → NL→SQL
         (pluggable) → fence strip → REAL select-only gate → spark.sql
         → Catalyst → capped records → markdown

Differences that are the point (SURVEY.md §4): one shared SparkSession
instead of a connect-per-query (reference doc.py:241-243); lazy views
instead of eager CTAS copies; an enforced safety gate instead of a
prompt promise; a collect cap instead of unbounded fetchdf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .executor import UnsafeSqlError, execute_sql
from .nl2sql import SqlGenerator, StubSqlGenerator
from .profile import profile_dataframe
from .registry import TableRegistry
from .sources.io import load_data_from_file


class AnalyticsEngine:
    """File-scoped analytic Q&A over Spark SQL."""

    def __init__(self, spark: SparkSession, generator: SqlGenerator | None = None):
        self.spark = spark
        self.registry = TableRegistry(spark)
        self.generator = generator or StubSqlGenerator()
        self._profiles: dict[str, dict] = {}

    # -- E2: upload/analyze ------------------------------------------------
    def analyze_file(self, file_path: str, file_id: str | None = None) -> dict:
        """Load + profile + register (reference analyze_file, doc.py:86-132).

        Returns {"success": True, "data_info": {...}} or {"error": msg}.
        data_info carries ``table_name`` where the reference carried
        ``db_path`` (per-file DuckDB file → per-file temp view).
        """
        df, error = load_data_from_file(self.spark, file_path)
        if error:
            return {"error": error}

        file_id = file_id or os.path.splitext(os.path.basename(file_path))[0]
        view = self.registry.register(file_id, df)
        data_info = profile_dataframe(df)
        data_info["table_name"] = view
        data_info["file_id"] = file_id
        self._profiles[file_id] = data_info
        return {"success": True, "data_info": data_info}

    # -- E1/E3: question over an analyzed file ------------------------------
    def analyze_data_with_ai(
        self, file_path: str, question: str, data_info: dict | None = None
    ) -> dict:
        """NL question → SQL → gated execution → reference-shaped result
        (reference analyze_data_with_ai, doc.py:134-260)."""
        if data_info is None:
            analyzed = self.analyze_file(file_path)
            if "error" in analyzed:
                return analyzed
            data_info = analyzed["data_info"]

        file_id = data_info.get("file_id")
        if file_id and self.registry.view_for(file_id):
            self.registry.activate(file_id)
        elif "error" not in (analyzed := self.analyze_file(file_path, file_id)):
            data_info = analyzed["data_info"]
        else:
            return analyzed

        file_name = os.path.basename(file_path)
        try:
            sql_query = self.generator.generate(file_name, data_info, question)
        except Exception as e:  # reference doc.py:207-210
            return {"error": f"SQL生成失败: {e}"}
        if not sql_query or not sql_query.strip():
            return {"error": "SQL查询生成失败"}

        try:
            result = execute_sql(self.spark, sql_query)
        except UnsafeSqlError as e:
            return {"error": str(e)}
        except Exception as e:  # reference doc.py:245-248
            return {"error": f"查询执行失败: {e}"}

        from .executor import clean_sql_response

        return {
            "question": question,
            "sql_query": clean_sql_response(sql_query),
            "data_info": data_info,
            "result": result,
        }
