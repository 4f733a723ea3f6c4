"""A PySpark-native analytics engine with the capabilities of
``abeltavares/etl-pulumi-aws-snowflake`` (reference, read-only at
``/root/reference``), rebuilt Spark-first per SURVEY.md.

Public surface:

- :func:`session.get_spark` / :func:`session.configure` — tuned sessions.
- :mod:`schemas` — explicit StructType registry (typed targets).
- :mod:`sources` — parquet/CSV/JSON scans + catalog registration.
- :mod:`operators` — align (by-name case-insensitive load), joins
  (as-of/range/salted), dedup, similarity, text, multimodal.
- :mod:`pipeline` — the reference ELT pipeline replayed as one linear
  Spark program (structurally removing the crawler race,
  SURVEY.md §3.1 step 3).
- :mod:`streaming` — file-arrival ingestion + stateful/windowed ops.
- :mod:`queries` — the executable operator inventory (driver contract).
"""

from __future__ import annotations

from .session import configure, get_spark

__all__ = ["configure", "get_spark"]
__version__ = "0.1.0"
