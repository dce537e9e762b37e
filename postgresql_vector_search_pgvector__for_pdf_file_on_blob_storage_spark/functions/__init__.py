"""Scalar / vector / text function library (native Catalyst expressions
first, pandas UDFs only where Python semantics are required)."""

from . import embed, text, vector  # noqa: F401

__all__ = ["vector", "text", "embed"]
