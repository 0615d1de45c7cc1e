"""Structured Streaming variants of the window operators (SURVEY.md §2.9
X1 [D]). Batch-mode equivalents live in queries/events_q.py so the DuckDB
oracle can check them; these run the same logic through readStream."""
