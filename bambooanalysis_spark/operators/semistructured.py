"""Semi-structured (JSON) column handling.

Real event streams carry a JSON properties blob per event; an analytics
engine has to project typed fields out of it without a Python UDF. Spark's
`from_json` parses once into a struct (JVM-side, codegen-friendly) and every
field access after that is a plain struct field — the right shape when a
query needs several fields. `get_json_object` re-parses per call, so it only
wins for a single ad-hoc path.

Reference parity note: the reference's inputs are fully typed ROOT trees, so
it has no JSON path (its engine never sees semi-structured data); this is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_json(col: Column, schema: str) -> Column:
    """Parse a JSON string column into a typed struct ONCE. `schema` is a
    DDL string like ``"k BIGINT, tag STRING"``. Malformed rows yield a
    struct of NULLs (PERMISSIVE), never a task failure — at 100 TB some
    rows WILL be malformed and one bad blob must not kill a stage."""
    return F.from_json(col, schema)


def with_json_fields(
    df: DataFrame, json_col: str, schema: str, prefix: str = ""
) -> DataFrame:
    """Project every field of a JSON column to a typed top-level column.
    One parse per row regardless of field count; the parquet scan still
    prunes to (json_col + whatever else is selected)."""
    parsed = parse_json(F.col(json_col), schema)
    # real DDL parse, not a text split: nested STRUCT<...>/MAP<...>/
    # DECIMAL(p,s) types contain commas (round-4 review finding)
    from pyspark.sql.types import _parse_datatype_string

    names = [f.name for f in _parse_datatype_string(schema).fields]
    return df.select(
        "*", *[parsed[n].alias(prefix + n) for n in names]
    ).drop(json_col)
