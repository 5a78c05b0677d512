"""kafka_custom_transforms_spark — a PySpark-native record-transformation engine.

Re-expresses the capabilities of the reference Kafka Connect SMT library
(``ludovic-boutros/kafka-custom-transforms``) as composable, Catalyst-friendly
``DataFrame -> DataFrame`` transforms that run identically in batch and
Structured Streaming, plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Reference parity surface (see SURVEY.md §2):
  - ``drop_fields``      <-> DropField            (reference DropField.java)
  - ``hoist_field``      <-> ExtendedHoistField   (reference ExtendedHoistField.java)
  - ``to_json_string``   <-> StructuredSchemalessToJsonString
                             (reference StructuredSchemalessToJsonString.java)

Design notes:
  - Every operator is a factory returning a ``DataFrame -> DataFrame`` callable
    (configure-once / apply-many, mirroring the Connect transform lifecycle,
    SURVEY.md §3). Chains compose with ``df.transform(t1).transform(t2)`` or
    :func:`transform_chain`.
  - Schema'd data = struct columns; schemaless data = JSON string columns
    (or MapType for flat homogeneous maps). See SURVEY.md §1.4.
  - Everything is built-in Catalyst expressions unless genuinely impossible;
    Python touches rows only in clearly-marked slow paths.
"""

from kafka_custom_transforms_spark.operators.chain import transform_chain
from kafka_custom_transforms_spark.operators.drop_field import drop_fields
from kafka_custom_transforms_spark.operators.hoist_field import hoist_field
from kafka_custom_transforms_spark.operators.to_json_string import to_json_string

__all__ = [
    "drop_fields",
    "hoist_field",
    "to_json_string",
    "transform_chain",
    "version",
    "CONFIG_DEFS",
]

__version__ = "0.2.0"


def version() -> str:
    """Library version — parity with the reference's ``Versioned`` interface
    (``version()`` via AppInfoParser, DropField.java:38-41)."""
    return __version__


# ConfigDef-style introspection (reference: SimpleConfig/ConfigDef per
# transform, DropField.java:23-28, ExtendedHoistField.java:42-45,
# StructuredSchemalessToJsonString.java:35). The same keys are enforced at
# factory-call time by each operator's kwarg validation; this table is the
# machine-readable mirror for tooling.
CONFIG_DEFS = {
    "drop_fields": {
        "paths": {"type": "list[str]", "default": [], "required": False,
                  "doc": "dot-separated field paths to drop (KIP-821 notation)"},
        "target": {"type": "str", "default": "value", "required": False,
                   "doc": "envelope column to operate on (Key/Value variants)"},
        "json_schema": {"type": "DDL str | StructType | None", "default": None,
                        "required": False,
                        "doc": "schema of JSON-string targets for the JVM fast path"},
    },
    "hoist_field": {
        "field": {"type": "str", "default": None, "required": True,
                  "doc": "wrapping field name (reference NO_DEFAULT_VALUE)"},
        "keep_in_root": {"type": "list[str]", "default": [], "required": False,
                         "doc": "top-level fields left at the root"},
        "target": {"type": "str", "default": "value", "required": False,
                   "doc": "envelope column to operate on"},
        "json_schema": {"type": "DDL str | StructType | None", "default": None,
                        "required": False, "doc": "JVM fast path for JSON targets"},
        "string_is_json": {"type": "bool", "default": True, "required": False,
                           "doc": "treat StringType targets as JSON text"},
    },
    "to_json_string": {
        "target": {"type": "str", "default": "value", "required": False,
                   "doc": "envelope column to operate on"},
        "force_structs": {"type": "bool", "default": False, "required": False,
                          "doc": "serialize struct (schema'd) targets too"},
    },
}
