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
        out = F.lpad(col.cast("string"), width, " ")
    elif kind == "double2":
        out = F.lpad(F.format_string("%.2f", col), width, " ")
    elif kind == "string":
        out = F.rpad(col, width, " ")
    elif kind == "date8":
        out = F.date_format(col, "yyyyMMdd")
    else:
        raise ValueError(f"unknown fixed-width kind {kind!r}")
    # NULL-safe: concat() null-propagates, so one NULL field would corrupt
    # the WHOLE record to an empty line (every field lost, silently). The
    # null check runs on the RAW column — format_string renders a NULL as
    # the literal string "null", which coalesce alone would miss. A NULL
    # writes as an all-blank field; the reader parses blanks back to NULL.
    return F.when(col.isNull(), F.lit(" " * width)).otherwise(out)


def _validate_spec(spec: Sequence[FieldSpec]) -> None:
    for name, kind, width in spec:
        # date_format always writes 8 chars while the reader advances by
        # ``width`` — any other width would silently misalign EVERY
        # subsequent field of every following record
        if kind == "date8" and width != 8:
            raise ValueError(
                f"fixed-width field {name!r}: date8 requires width 8, got {width}"
            )
        if width <= 0:
            raise ValueError(f"fixed-width field {name!r}: width must be > 0")


def write_fixed_width(df: DataFrame, path: str, spec: Sequence[FieldSpec]) -> None:
    """NOTE: values wider than their field are truncated by lpad/rpad (the
    copybook contract — the writer owns the width guarantee); size fields
    from the domain's maximum, not the sample.

    NULL encoding conflates '' with NULL for strings: NULLs write as
    all-blank fields, and the reader's nullif(rtrim, '') maps any all-blank
    (or genuinely empty/whitespace-only) string value back to NULL. That is
    the classic copybook convention — fixed-width has no out-of-band NULL
    marker — but it means empty-string values do NOT round-trip as ''. If
    '' is a legal value in your domain, reserve a sentinel (e.g. a LOW-
    VALUES byte) rather than relying on blanks."""
    _validate_spec(spec)
    line = F.concat(*[_fmt(F.col(n), k, w) for n, k, w in spec])
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_fixed_width(
    spark: SparkSession, path: str, spec: Sequence[FieldSpec]
) -> DataFrame:
    _validate_spec(spec)
    raw = spark.read.text(path)
    cols = []
    pos = 1  # substring() is 1-based
    for name, kind, width in spec:
        sub = F.substring("value", pos, width)
        # nullif(trim, ''): an all-blank field is a NULL value (the writer's
        # encoding) — casting '' under ANSI would throw; genuinely garbage
        # non-blank content still errors, which is the strict contract
        blank_null = F.nullif(F.trim(sub), F.lit(""))
        if kind == "bigint":
            cols.append(blank_null.cast("bigint").alias(name))
        elif kind == "double2":
            cols.append(blank_null.cast("double").alias(name))
        elif kind == "string":
            cols.append(F.nullif(F.rtrim(sub), F.lit("")).alias(name))
        elif kind == "date8":
            cols.append(F.to_date(blank_null, "yyyyMMdd").alias(name))
        else:
            raise ValueError(f"unknown fixed-width kind {kind!r}")
        pos += width
    return raw.select(*cols)
