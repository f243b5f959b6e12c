"""Distributed connected components + dup-cluster edge generation.

The missing piece between near-dup PAIRS (minhash_lsh_dedup,
embedding_near_dup) and usable training-data dedup: group pairs into
CLUSTERS and keep one representative per cluster.

``connected_components`` — iterative min-label propagation over an
edge list, expressed entirely in Ray Data exchanges:

  round:  (1) co-group each node's current label with its adjacency
              (ONE hash exchange on node over labels ∪ edges), emit
              ``label(u)`` to every neighbor + to u itself;
          (2) group messages by node (second exchange), new label =
              min(candidates); count label changes.
  stop:   when no label changed (≤ component diameter rounds — near-
          dup clusters have tiny diameters, typically 1–3).

Per-round traffic is O(E + N) message rows — never the corpus; the
labels table is materialized between rounds (node-scale, not
corpus-scale).  Partitioning assumption: a node's messages hash to one
partition; no single node's degree need fit in memory beyond its
message rows.

``rare_shingle_edges`` — deterministic, SQL-reproducible edge set:
two docs are linked iff they share a character ``k``-gram that occurs
in between 2 and ``max_docs`` distinct docs (rare-shingle blocking —
the bucket-groupby shape of substring dedup; the ``max_docs`` cap
bounds pair fan-out per gram, so a stop-phrase shared by a million
docs never explodes into a million² pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .partition import group_apply


def rare_shingle_edges(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    max_docs: int = 5,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Edges ``(a, b)`` (a < b, distinct) between docs sharing a rare
    character k-gram.  Gram semantics match SQL ``substr(text, i, k)``
    for ``i in 1..greatest(len-k+1, 1)`` — docs shorter than ``k``
    contribute themselves as their only gram."""

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        ids, gs = [], []
        for i, t in zip(df[id_col], df[text_col]):
            t = str(t)
            if len(t) <= k:
                uniq = {t}
            else:
                uniq = {t[j:j + k] for j in range(len(t) - k + 1)}
            ids.extend([i] * len(uniq))
            gs.extend(uniq)
        return pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64),
                             "g": gs})

    gram_rows = ds.select_columns([id_col, text_col]).map_batches(
        grams, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["g", id_col], kind="mergesort")
        gv = d["g"].to_numpy()
        ids = d[id_col].to_numpy()
        change = np.r_[True, gv[1:] != gv[:-1]]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(d)]
        sizes = ends - starts
        keep = (sizes >= 2) & (sizes <= max_docs)
        A, B = [], []
        for s, e in zip(starts[keep], ends[keep]):
            g = ids[s:e]
            iu, ju = np.triu_indices(e - s, k=1)
            A.append(g[iu])
            B.append(g[ju])
        if not A:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        out = pd.DataFrame({"a": np.concatenate(A), "b": np.concatenate(B)})
        return out.drop_duplicates(["a", "b"])

    pairs = group_apply(gram_rows, bucket_pairs,
                        num_partitions=num_partitions, key="g")
    return group_apply(pairs, lambda df: df.drop_duplicates(["a", "b"]),
                       num_partitions=8, key="a")


_MSG_SCHEMA = pa.schema([
    pa.field("node", pa.int64()),
    pa.field("other", pa.int64()),   # neighbor (edge rows) / -1
    pa.field("label", pa.int64()),   # current label (label rows) / -1
    pa.field("is_label", pa.uint8()),
])


def connected_components(
    edges_ds: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 32,
    max_iters: int = 50,
) -> pd.DataFrame:
    """Labels ``(node, cluster)`` with ``cluster`` = min node id in the
    node's connected component.  Only nodes appearing in the edge list
    are returned (callers union in singletons if needed)."""

    def to_sym(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        other = np.concatenate([b, a])
        n = len(node)
        return pa.Table.from_arrays(
            [pa.array(node), pa.array(other),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.zeros(n, dtype=np.uint8))],
            schema=_MSG_SCHEMA)

    sym = edges_ds.map_batches(to_sym, batch_format="pyarrow").materialize()
    if sym.count() == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int64")})

    def init_labels(batch: pa.Table) -> pa.Table:
        node = np.unique(batch["node"].to_numpy(zero_copy_only=False))
        n = len(node)
        return pa.Table.from_arrays(
            [pa.array(node), pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(node),
             pa.array(np.ones(n, dtype=np.uint8))],
            schema=_MSG_SCHEMA)

    # batch-level unique is enough: duplicate (node, node) label rows
    # collapse at the first reduce
    labels = sym.map_batches(init_labels, batch_format="pyarrow").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["is_label"] == 1]
        ed = df[df["is_label"] == 0]
        # per-node current label (min collapses any duplicate rows)
        lmap = lab.groupby("node", sort=False)["label"].min()
        # self message carries the old label (marked), neighbor
        # messages carry this node's label to each neighbor
        self_msgs = pd.DataFrame({
            "node": lmap.index.to_numpy(np.int64),
            "cand": lmap.to_numpy(np.int64),
            "is_self": np.uint8(1),
        })
        if len(ed):
            src_lab = lmap.reindex(ed["node"].to_numpy()).to_numpy(np.int64)
            nbr_msgs = pd.DataFrame({
                "node": ed["other"].to_numpy(np.int64),
                "cand": src_lab,
                "is_self": np.uint8(0),
            })
            return pd.concat([self_msgs, nbr_msgs], ignore_index=True)
        return self_msgs

    def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)
        new = g["cand"].min()
        old = df[df["is_self"] == 1].set_index("node")["cand"]
        old = old.reindex(new.index)
        return pd.DataFrame({
            "node": new.index.to_numpy(np.int64),
            "label": new.to_numpy(np.int64),
            "changed": (new.to_numpy(np.int64)
                        < old.to_numpy(np.int64)).astype(np.int64),
        })

    for _ in range(max_iters):
        msgs = group_apply(labels.union(sym), propagate,
                           num_partitions=num_partitions, key="node")
        out = group_apply(msgs, reduce_min,
                          num_partitions=num_partitions, key="node").materialize()
        changed = out.sum("changed")
        if not changed:
            break

        def relabel(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.Table.from_arrays(
                [batch["node"].cast(pa.int64()),
                 pa.array(np.full(n, -1, dtype=np.int64)),
                 batch["label"].cast(pa.int64()),
                 pa.array(np.ones(n, dtype=np.uint8))],
                schema=_MSG_SCHEMA)

        labels = out.drop_columns(["changed"]).map_batches(
            relabel, batch_format="pyarrow").materialize()
    final = out.drop_columns(["changed"]).to_pandas()
    return (final.rename(columns={"label": "cluster"})
            .sort_values("node").reset_index(drop=True))
