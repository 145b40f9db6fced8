"""Reusable column-expression builders (all JVM-side, zero Python UDFs)."""

from . import text, vectors  # noqa: F401
