"""Generate a scaled bench fixture by FK-consistent replication (VERDICT r02 #3).

The driver ships fixtures up to sf0.1; the bench gate, though, is about how
plans behave when exchanges stop fitting in page cache.  This script builds
an sfN fixture from sf0.1 by replicating every linearly-scaling table
``factor`` times with a constant key stride, preserving the workload's
*shape* rather than naively duplicating rows:

- **Keys** (PKs and every referencing FK) get ``replica * STRIDE`` added,
  so join fan-outs, group cardinalities, and per-key row counts all scale
  the way a real sfN dataset would (10x orders per region, same lineitems
  per order, same events per user — just 10x more users).
- **documents.text** is passed through a per-replica rotation of the 10
  most common letters (``translate``): within a replica the planted
  exact-dup / near-dup / quality structure is bit-preserved, while across
  replicas texts share almost no shingles — so dedup output scales ~linearly
  instead of every doc acquiring ``factor-1`` artificial twins (which would
  blow the pair count quadratically and measure a workload nobody runs).
  ``translate`` preserves length, so ``n_chars`` stays valid.
- **embeddings** keep replica 0 verbatim and draw fresh deterministic
  pseudo-random unit-range coordinates for replicas >0 (sin-hash of
  ``(vec_id, dim)``), for the same reason: replicated vectors would make
  every vector a 0-distance twin of ``factor-1`` others.
- ``region``/``nation`` are fixed-size dimensions in TPC-H and are copied
  as-is.

Everything runs as Spark column expressions over one ``crossJoin`` with a
``spark.range(factor)`` replica axis — no driver-side loops, no UDFs — so
the same script scales to building sf10/sf100 on a cluster.

Usage:
    python scripts/make_scaled_fixture.py \
        [--src /root/testdata/sf0.1] [--out .fixtures/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (  # noqa: E402
    load_table,
)

# Larger than any key in any fixture generation; one uniform stride keeps
# FK edges consistent across tables without per-table bookkeeping.
STRIDE = 10_000_000

# Keys to offset, per table.  Every column here is either the table's PK or
# an FK into another replicated table — nation/region keys are NOT offset
# (those dims stay fixed-size, as in TPC-H).
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# Output part-file counts sized so each part lands in the 10-100 MB range
# at factor=10 — enough files that single-file hotspots (the reason
# utils.spread exists) never form.
N_FILES = {
    "customer": 4,
    "supplier": 1,
    "part": 4,
    "orders": 16,
    "lineitem": 32,
    "events": 16,
    "documents": 8,
    "embeddings": 4,
}

ROT_ALPHABET = "aeiousnrtl"


def _replicate(df: DataFrame, factor: int, keys: list[str]) -> DataFrame:
    reps = df.sparkSession.range(factor).select(
        F.col("id").cast("int").alias("__rep")
    )
    out = df.crossJoin(F.broadcast(reps))
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("__rep").cast("long") * STRIDE)
    return out


def _rotated_text(col: str, factor: int):
    """Per-replica ``translate`` over the 10 highest-frequency letters —
    injective per replica (dup structure preserved), near-disjoint shingles
    across replicas."""
    expr = F.col(col)
    out = F.when(F.col("__rep") == 0, expr)
    for i in range(1, factor):
        rot = ROT_ALPHABET[i:] + ROT_ALPHABET[:i]
        out = out.when(F.col("__rep") == i, F.translate(expr, ROT_ALPHABET, rot))
    return out


def _pseudo_random_vec(dim: int):
    """Deterministic sin-hash coordinates in [-1, 1) keyed on the NEW vec_id
    and the coordinate index — the classic shader hash, all JVM-side."""
    def coord(j):
        x = F.sin(F.col("vec_id").cast("double") * 12.9898 + j.cast("double") * 78.233) * 43758.5453
        return ((x - F.floor(x)) * 2.0 - 1.0).cast("float")

    return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), coord)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="make_scaled_fixture")
    os.makedirs(args.out, exist_ok=True)

    for name in ["region", "nation"]:
        load_table(spark, args.src, name).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.out, f"{name}.parquet"))

    for name, keys in KEY_COLS.items():
        df = load_table(spark, args.src, name)
        out = _replicate(df, args.factor, keys)
        if name == "documents":
            out = out.withColumn("text", _rotated_text("text", args.factor))
        elif name == "embeddings":
            dim = len(df.select("embedding").first()[0])
            out = out.withColumn(
                "embedding",
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    _pseudo_random_vec(dim)
                ),
            )
        (
            out.select(df.columns)  # drop __rep, keep original column order
            .repartition(N_FILES[name])
            .write.mode("overwrite")
            .parquet(os.path.join(args.out, f"{name}.parquet"))
        )
        print(f"wrote {name} x{args.factor}")


if __name__ == "__main__":
    main()
