"""By-name, case-insensitive schema alignment.

Reproduces the reference's warehouse-load semantics — Snowpipe's
``COPY INTO ... MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE``
(``/root/reference/modules/snowflake.py:150``): source columns are
matched to target columns by lowercased name; matched columns are cast
to the target type; target columns with no source match become NULL;
source columns with no target match are dropped.

This is a pure projection (no shuffle, stays inside whole-stage
codegen), so it is free at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align(df: DataFrame, target: T.StructType, strict: bool = False) -> DataFrame:
    """Project ``df`` onto ``target``'s columns by case-insensitive name.

    Ties (two source columns differing only in case) resolve to the
    first source column in ``df.columns`` order, mirroring the
    deterministic first-match behavior a by-name loader needs.

    ``strict=False`` (default) uses ``try_cast`` — an uncastable value
    loads as NULL, the resilient posture for a 100 TB load where one bad
    record must not kill the job.  ``strict=True`` uses ANSI ``cast``,
    matching Snowflake COPY's default abort-on-error.
    """
    # Rename positionally to unique temp names first: Spark's analyzer is
    # itself case-insensitive by default, so two source columns differing
    # only in case would otherwise be AMBIGUOUS_REFERENCE.
    tmp_names = [f"__align_src_{i}" for i in range(len(df.columns))]
    tmp = df.toDF(*tmp_names)
    lookup: dict[str, str] = {}
    for original, tmp_name in zip(df.columns, tmp_names):
        lookup.setdefault(original.lower(), tmp_name)
    cols = []
    for field in target.fields:
        src = lookup.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif strict:
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(src).try_cast(field.dataType).alias(field.name))
    return tmp.select(cols)
