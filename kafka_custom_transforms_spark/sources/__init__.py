"""Data sources: parquet test tables and Kafka-envelope readers."""
