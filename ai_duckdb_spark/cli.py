"""CLI entry point (reference E1: main.py:9-29).

One-shot flow: file path + question → analyze → NL→SQL → execute →
print the result head (the reference prints the first 5 rows,
main.py:24-25). Arguments can be passed on the command line or entered
interactively, mirroring the reference's input() prompts.

Usage:
    python -m ai_duckdb_spark.cli <file> "<question>"
"""

from __future__ import annotations

import sys

from .engine import AnalyticsEngine
from .formatter import format_analysis_result
from .nl2sql import default_generator
from .session import get_spark

DISPLAY_HEAD = 5  # reference main.py:24


def run(file_path: str, question: str) -> int:
    spark = get_spark(app_name="ai_duckdb_spark_cli")
    engine = AnalyticsEngine(spark, generator=default_generator())
    result = engine.analyze_data_with_ai(file_path, question)

    if "error" in result:
        print(f"分析失败: {result['error']}")
        return 1

    print(f"问题: {result['question']}")
    print(f"SQL: {result['sql_query']}")
    rows = result["result"]["data"]
    print(f"结果 ({result['result']['row_count']} 行, 显示前 {min(DISPLAY_HEAD, len(rows))} 行):")
    for row in rows[:DISPLAY_HEAD]:
        print(" ", row)
    print()
    print(format_analysis_result(result))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) >= 2:
        file_path, question = argv[0], argv[1]
    else:
        file_path = input("请输入数据文件路径: ").strip()
        question = input("请输入您的问题: ").strip()
    return run(file_path, question)


if __name__ == "__main__":
    raise SystemExit(main())
