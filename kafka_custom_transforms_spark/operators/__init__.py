"""Operator factories: each returns a ``DataFrame -> DataFrame`` callable."""
