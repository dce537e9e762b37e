"""Incremental (streaming) semantic dedup — the SemDeDup question asked
at ingest time (SURVEY.md §2B B17 x B13 composition): *as each new
embedding arrives, is it a semantic duplicate of anything already
accepted?*

Mirrors streaming/neardup.py's store design, with the cluster layout
doing the candidate pruning that MinHash bands do for text:

- Coarse centroids are FROZEN up front (:func:`fit_frozen_centroids`, or
  any saved ann.IVFIndex's centroids) — pgvector-ivfflat semantics: the
  quantizer does not drift per batch, so assignment is a pure function
  and the store layout stays stable.  Remedy for drift is an offline
  rebuild, same as the batch IVF operator documents.
- A **vector store** (parquet, partitioned by ``cluster_id``) holds one
  ``(id, cluster_id, embedding)`` row per accepted vector, embeddings
  L2-NORMALIZED ON WRITE so every later comparison is a plain dot.
- Per micro-batch: assign new vectors to their nearest frozen centroid
  (native expressions — centroids inlined as literals, no Python), read
  ONLY the store partitions for clusters present in the batch (partition
  pruning on the parquet layout), score new-vs-store and new-vs-new
  (smaller id wins) within matching clusters, append matches, then
  register the batch into the store.
- State is a relation, not executor memory: restart from the checkpoint
  reuses the store, exactly like the band store.

``foreachBatch`` again, not ``applyInPandasWithState``: the state is a
growing *table* joined per batch, the documented stream-static pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from ..utils import spread

__all__ = ["fit_frozen_centroids", "detect_and_register", "semdedup_stream"]


def fit_frozen_centroids(
    items: DataFrame,
    k_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    fit_fraction: float = 1.0,
) -> list[list[float]]:
    """k-means centroids as plain lists (the frozen coarse quantizer).
    Same fit seam as operators.semdedup.cluster_assign, returned in the
    inline-literal form :func:`detect_and_register` assigns against."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = spread(items).withColumn(
        "__features", array_to_vector(F.col(vec_col))
    )
    km = KMeans(
        k=k_clusters, seed=seed, featuresCol="__features", maxIter=max_iter
    )
    fit_on = (
        feat if fit_fraction >= 1.0 else feat.sample(fit_fraction, seed=seed)
    )
    return [list(map(float, c)) for c in km.fit(fit_on).clusterCenters()]


def _assign(df: DataFrame, centroids: list[list[float]], vec_col: str):
    """Nearest-centroid cluster_id, native expressions only (ties to the
    lowest id — same convention as ann.IVFIndex.assign)."""
    dists = F.array(
        *[
            V.squared_l2_distance(
                F.col(vec_col), F.array(*[F.lit(x) for x in c])
            )
            for c in centroids
        ]
    )
    cid = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn("cluster_id", cid)


def detect_and_register(
    batch: DataFrame,
    centroids: list[list[float]],
    store_dir: str,
    matches_dir: str,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Process one (micro-)batch of new vectors: append semantic-dup
    matches ``(new_id, matched_id, cos_dist)`` to ``matches_dir`` —
    ``matched_id`` is an earlier-accepted vector from the store or a
    smaller-id vector in the same batch — then register the batch.
    Callable directly on a static DataFrame (the batch twin the tests
    pin) or from ``foreachBatch``."""
    spark = batch.sparkSession
    nrm = V.l2_norm(vec_col)
    new = (
        _assign(
            spread(batch).select(
                F.col(id_col).cast("long").alias("id"), F.col(vec_col)
            ),
            centroids,
            vec_col,
        )
        .withColumn("__n", nrm)
        .select(
            "id",
            "cluster_id",
            F.transform(
                vec_col, lambda x: x.cast("double") / F.col("__n")
            ).alias("vec"),
        )
        .localCheckpoint(eager=True)
    )
    sim = F.lit(1.0) - V.dot_product(F.col("a.vec"), F.col("b.vec"))
    cand_new = (
        new.alias("a")
        .join(
            new.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("new_id"),
            F.col("b.id").alias("matched_id"),
            sim.alias("cos_dist"),
        )
    )
    cand = cand_new
    if os.path.exists(store_dir):
        # Partition-pruned store read: only clusters present in this
        # batch are ever opened (cluster count is small by construction,
        # so the IN-list is a literal pruning predicate).
        batch_clusters = [
            r["cluster_id"] for r in new.select("cluster_id").distinct().collect()
        ]
        store = spark.read.parquet(store_dir).filter(
            F.col("cluster_id").isin(batch_clusters)
        )
        cand_old = (
            new.alias("a")
            .join(
                store.alias("b"),
                F.col("a.cluster_id") == F.col("b.cluster_id"),
            )
            .select(
                F.col("a.id").alias("new_id"),
                F.col("b.id").alias("matched_id"),
                sim.alias("cos_dist"),
            )
        )
        cand = cand_new.unionByName(cand_old)
    matches = cand.filter(F.col("cos_dist") < F.lit(float(eps)))
    matches.write.mode("append").parquet(matches_dir)
    # Register AFTER matching (a batch never matches its own store rows;
    # the within-batch join covers those pairs exactly once).
    new.write.partitionBy("cluster_id").mode("append").parquet(store_dir)


def semdedup_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    centroids: list[list[float]],
    store_dir: str,
    matches_dir: str,
    checkpoint: str,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming wrapper: parquet-directory source -> per-micro-batch
    :func:`detect_and_register`.  AvailableNow trigger drains the backlog
    and stops; restarting with the same checkpoint processes only new
    files, with the vector store carrying accepted state across runs."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        detect_and_register(
            batch_df,
            centroids,
            store_dir,
            matches_dir,
            eps=eps,
            id_col=id_col,
            vec_col=vec_col,
        )

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
