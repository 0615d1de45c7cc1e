"""Markdown result shaping (SURVEY.md §2.2 K3 — user-visible contract).

Re-implements the reference formatter's observable behavior
(reference app.py:35-107): SQL code block, profile bullets, a table of
the first 10 rows with floats ``%.2f``, ints thousands-separated,
``None`` → ``null``, strings truncated at 50 chars with ``...``, and a
"showing first 10 of N" footer. Pure driver-side string work over the
executor's already-capped record dict — no Spark interaction.
"""

from __future__ import annotations

DISPLAY_ROWS = 10
TRUNCATE_AT = 50


def _format_cell(value) -> str:
    if value is None:
        return "null"
    if isinstance(value, bool):  # bool is an int subclass — keep it textual
        return str(value)
    if isinstance(value, float):
        return f"{value:.2f}"
    if isinstance(value, int):
        return f"{value:,}"
    text = str(value)
    if len(text) > TRUNCATE_AT:
        text = text[: TRUNCATE_AT - 3] + "..."
    return text


def format_analysis_result(result: dict) -> str:
    """Analysis-result dict → markdown (reference app.py:35-107 contract)."""
    if "error" in result:
        return f"❌ **错误**: {result['error']}"

    lines: list[str] = []
    lines.append("## 📊 数据分析结果")
    lines.append(f"**问题**: {result['question']}")
    lines.append("")
    lines.append("### 🔍 生成的SQL查询")
    lines.append("```sql")
    lines.append(result["sql_query"])
    lines.append("```")
    lines.append("")

    data_info = result["data_info"]
    lines.append("### 📋 数据概览")
    lines.append(f"- **行数**: {data_info['行数']:,}")
    lines.append(f"- **列数**: {data_info['列数']}")
    lines.append(f"- **列名**: {', '.join(data_info['列名'])}")
    lines.append("")

    query_result = result["result"]
    row_count = query_result["row_count"]
    lines.append(f"### 📈 查询结果 ({row_count:,} 行)")

    if row_count == 0:
        lines.append("没有找到匹配的数据。")
    else:
        columns = query_result["columns"]
        data = query_result["data"]
        lines.append("| " + " | ".join(columns) + " |")
        lines.append("| " + " | ".join([":---"] * len(columns)) + " |")
        for row in data[:DISPLAY_ROWS]:
            lines.append("| " + " | ".join(_format_cell(row.get(c)) for c in columns) + " |")
        if row_count > DISPLAY_ROWS:
            lines.append("")
            lines.append(f"*显示前 {DISPLAY_ROWS} 行，共 {row_count:,} 行*")

    return "\n".join(lines)
