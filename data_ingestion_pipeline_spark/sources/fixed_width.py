"""Fixed-width (mainframe/COBOL copybook-style) text ingest.

The one legacy interchange format the sources layer otherwise lacks: no
delimiters, no quoting — every field is (offset, width), numbers are
formatted at fixed precision, strings are space-padded. The reader is a
pure column-slicing projection over ``spark.read.text`` (whole-stage
codegen, no UDFs, trivially splittable since records are lines), which is
exactly how a 100 TB EBCDIC-converted dump should be scanned.

A field spec is ``(name, kind, width)`` with kinds:

- ``bigint``  — right-aligned integer, space-padded
- ``double2`` — ``%.2f`` fixed-point, right-aligned (ties at the third
  decimal are not binary-representable, so HALF_UP vs HALF_EVEN printf
  differences can never fire — both engines format identically)
- ``string``  — left-aligned, space-padded (trailing spaces stripped on
  read; embedded trailing spaces are therefore NOT round-trippable, the
  documented fixed-width trade)
- ``date8``   — ``yyyyMMdd``
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_fixed_width", "read_fixed_width"]

FieldSpec = tuple[str, str, int]


def _fmt(col: F.Column, kind: str, width: int) -> F.Column:
    if kind == "bigint":
        return F.lpad(col.cast("string"), width, " ")
    if kind == "double2":
        return F.lpad(F.format_string("%.2f", col), width, " ")
    if kind == "string":
        return F.rpad(col, width, " ")
    if kind == "date8":
        return F.date_format(col, "yyyyMMdd")
    raise ValueError(f"unknown fixed-width kind {kind!r}")


def write_fixed_width(df: DataFrame, path: str, spec: Sequence[FieldSpec]) -> None:
    line = F.concat(*[_fmt(F.col(n), k, w) for n, k, w in spec])
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_fixed_width(
    spark: SparkSession, path: str, spec: Sequence[FieldSpec]
) -> DataFrame:
    raw = spark.read.text(path)
    cols = []
    pos = 1  # substring() is 1-based
    for name, kind, width in spec:
        sub = F.substring("value", pos, width)
        if kind == "bigint":
            cols.append(F.trim(sub).cast("bigint").alias(name))
        elif kind == "double2":
            cols.append(F.trim(sub).cast("double").alias(name))
        elif kind == "string":
            cols.append(F.rtrim(sub).alias(name))
        elif kind == "date8":
            cols.append(F.to_date(sub, "yyyyMMdd").alias(name))
        else:
            raise ValueError(f"unknown fixed-width kind {kind!r}")
        pos += width
    return raw.select(*cols)
