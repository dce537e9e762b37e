"""Composed operators: exact/approximate kNN, similarity joins, dedup,
text analytics — each built from declarative DataFrame plans."""

from . import bpe, dedup, knn, semdedup, textstats  # noqa: F401

__all__ = ["knn", "dedup", "textstats", "bpe", "semdedup"]
