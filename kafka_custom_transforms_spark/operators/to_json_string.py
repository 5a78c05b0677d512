"""to_json_string — serialize schemaless structured data to a JSON string.

Parity target: reference ``StructuredSchemalessToJsonString``
(StructuredSchemalessToJsonString.java:45-62; SURVEY.md §2.3). The reference
has no config; this factory's parameters only choose how the reference's
runtime ``schema == null && value instanceof Map`` dispatch maps onto static
column types.

Branches:
  J1  schemaless Map -> JSON string (Jackson writeValueAsString, :49-54).
      Here: MapType column -> ``to_json``. Key order: the reference's is
      HashMap iteration order (nondeterministic); ours is map entry order —
      the driver's order-insensitive compare neutralizes this (SURVEY.md §5).
  J2  JsonProcessingException wrap — ``to_json`` cannot fail on supported
      types; non-issue.
  J3  passthrough: schema'd values and schemaless non-Map primitives are
      returned untouched (:61). Here: StructType (schema'd) and all other
      dtypes pass through. ``force_structs=True`` opts structs in for users
      who want the serialization anyway.
  J4  Key/Value variants — the ``target`` parameter.

Scale: a single codegen-capable JVM expression; no shuffle, no Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import MapType, StructType


def to_json_string(
    target: str = "value",
    force_structs: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    """Build a transform serializing a MapType ``target`` column to JSON text;
    everything else passes through (J3), unless ``force_structs``."""

    def _transform(df: DataFrame) -> DataFrame:
        dtype = df.schema[target].dataType
        if isinstance(dtype, MapType) or (force_structs and isinstance(dtype, StructType)):
            return df.withColumn(target, F.to_json(F.col(target)))
        return df  # J3 — same DataFrame object, the reference's same-record passthrough

    return _transform
