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
]

__version__ = "0.1.0"
