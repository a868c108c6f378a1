"""Shared column-expression function library.

Everything here is a composition of built-in Catalyst expressions --
JVM-side, whole-stage-codegen-able, no Python in the data path. Two
families:

- Decimal-exact money helpers (``dec2``/``dsum``): double summation
  order differs between engines, so money aggregates run in
  DECIMAL(18,2) (exact for <=2-decimal inputs in both Spark and
  DuckDB) and convert the exact result to DOUBLE once at the end --
  correctly rounded, hence bit-identical across engines (see
  plans/catalog.py module doc for the full determinism contract).
- Vector algebra over ``array<float>`` embedding columns
  (``dot``/``cosine``): order-stable higher-order folds, used by the
  similarity-search operators and directly composable in any query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec2", "dsum", "dot", "cosine"]


def dec2(name: str) -> Column:
    """Money/ratio column (<=2 intrinsic decimal places) as exact decimal."""
    return F.col(name).cast("decimal(18,2)")


def dsum(expr: Column) -> Column:
    """Exact decimal sum, emitted as a bit-deterministic double."""
    return F.sum(expr).cast("double")


def dot(a: Column, b: Column) -> Column:
    """Order-stable double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays (double math)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
