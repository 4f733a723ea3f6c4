"""Scalar / higher-order expression builders shared by operators and
oracle SQL (SURVEY.md §2.8, §2.10)."""

from . import hashing, text, vectors

__all__ = ["hashing", "text", "vectors"]
# NOTE: hilbert / zorder / layout are imported directly by callers
# (layout pulls in a pandas_udf at definition time, so it stays out of
# the eager package import).
