"""Executable operator inventory (SURVEY.md §2 made runnable).

Every operator the engine claims is registered here as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string with IDENTICAL output column names.  The driver
hash-compares the two at sf0.01.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query

# Import for registration side effects — order mirrors SURVEY.md §2.
from . import relational  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import setops_sorts  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import stream_windows  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_similarity  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import llm_multimodal  # noqa: E402,F401
from . import llm_sampling  # noqa: E402,F401


def all_queries():
    return dict(QUERIES)


def all_oracles():
    return dict(ORACLES)


__all__ = ["QUERIES", "ORACLES", "query", "all_queries", "all_oracles"]
