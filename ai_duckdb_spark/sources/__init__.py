"""Ingestion sources (SURVEY.md §2.1 S1-S7)."""

from .io import ALLOWED_SUFFIXES, load_data_from_file  # noqa: F401
