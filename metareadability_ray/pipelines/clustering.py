"""Duplicate-pair → cluster resolution (connected components + survivor pick).

Near-dup pipelines (ngram_jaccard_pairs / minhash_lsh_pairs /
lsh_neardup_pairs) emit PAIRS; an actual dedup needs components: every doc in
a transitively-connected dup group maps to one cluster, whose survivor is the
smallest doc_id (= the cluster_id).

Algorithm: iterative min-label propagation, all Ray Data —
  labels₀(v) = v; labelsᵢ₊₁(v) = min(labelsᵢ(v), min over neighbours u of
  labelsᵢ(u)) — converges to the component minimum in ≤ diameter rounds
  (dup clusters are near-cliques, so 2–3 rounds in practice; ``max_iters``
  bounds the worst case and convergence is detected by the label-sum fixed
  point, valid because labels only ever decrease).

Scale shape: per round, one reduce-side attach (labels onto edge sources,
union + groupby — robust to empty partitions) and one groupby-min; the
labels table (one row per doc that appears in ≥1 pair — the DUP subset, far
smaller than the corpus) is materialized between rounds to stop lazy
re-execution of the whole chain each iteration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min, Sum

from metareadability_ray.pipelines.textops import ngram_jaccard_pairs, reduce_side_attach

I64 = pa.int64()


def connected_components(
    pairs: "ray.data.Dataset", max_iters: int = 8
) -> "ray.data.Dataset":
    """(doc_a, doc_b) pair Dataset → (doc_id, cluster_id) with cluster_id =
    min doc_id of the connected component."""

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        if isinstance(a, pa.ChunkedArray):
            a, b = a.combine_chunks(), b.combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a.cast(I64), b.cast(I64)]),
                "dst": pa.concat_arrays([b.cast(I64), a.cast(I64)]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("src"), "label": batch.column("src")})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    def label_sum(ds: "ray.data.Dataset") -> int:
        res = ds.aggregate(Sum("label", alias_name="s"))
        return int(res["s"]) if res and res.get("s") is not None else 0

    prev_sum = label_sum(labels)
    for _ in range(max_iters):
        # message pass: every edge ships its source's current label to dst
        msgs = reduce_side_attach(
            edges, "src", [("src", I64), ("dst", I64)],
            labels, "doc_id", "label", "label", I64,
        )

        def msg_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("dst"), "label": batch.column("label")})

        def own_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("doc_id"), "label": batch.column("label")})

        labels = (
            labels.map_batches(own_rows, batch_format="pyarrow", zero_copy_batch=True)
            .union(msgs.map_batches(msg_rows, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("doc_id")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = label_sum(labels)
        if cur == prev_sum:  # labels only decrease → fixed point reached
            break
        prev_sum = cur

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "cluster_id": batch.column("label")}
        )

    return labels.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_dup_clusters(sf_dir: str) -> "ray.data.Dataset":
    """Connected components over the EXACT ngram-jaccard pair stream (the
    SQL-checkable edge set; swap in minhash_lsh_pairs at 100 TB).
    Output: one row per doc in ≥1 dup pair; cluster_id = surviving doc."""
    pairs = ngram_jaccard_pairs(sf_dir, k=3, thresh_num=1, thresh_den=5)
    return connected_components(pairs)
