"""Connected components over near-duplicate pairs -> cluster assignments.

The dedup detectors emit (id, dup_of) pairs against bucket representatives;
transitive duplicates (A~B, B~C) need component clustering to assign one
canonical id per cluster. Two implementations:

  * ``cluster_pairs`` — driver-side union-find. The pair set is proportional
    to duplicate mass (tiny relative to the corpus by construction — it
    already survived LSH + verification), so collecting it is the
    documented small-side assumption (ray_guide: "union-find on the driver
    only if the candidate set is provably small").
  * ``cluster_pairs_distributed`` — iterative min-label propagation with
    ``groupby``: each round every node takes the min label among itself and
    its neighbors; converges in O(diameter) rounds. Use when the pair set
    itself is too large to collect. Requires integer node ids (labels travel
    through nullable numeric columns).

Both return (id, cluster_id) with cluster_id = min id in the component,
and are equivalence-tested against each other.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min


def cluster_pairs(pairs: rd.Dataset, id_col: str, dup_of_col: str = "dup_of"):
    """Union-find on the driver. Returns dict {id: cluster_min_id} covering
    every id that appears in any pair."""
    df = pairs.to_pandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(df[id_col], df[dup_of_col]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in set(df[id_col]) | set(df[dup_of_col])}


def cluster_pairs_distributed(
    pairs: rd.Dataset, id_col: str, dup_of_col: str = "dup_of", max_rounds: int = 16
) -> rd.Dataset:
    """Min-label propagation. Each round: label(node) <- min(label(node),
    min(label(neighbor))) via an undirected message groupby. Stops early
    when a round changes nothing (cheap count check on a changed-flag).

    Returns a Dataset (id_col, cluster_id)."""

    def explode(t: pa.Table) -> pa.Table:
        a = t[id_col]
        b = t[dup_of_col]
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [a.combine_chunks(), b.combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [b.combine_chunks(), a.combine_chunks()]
                ),
            }
        )

    edges = pairs.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    # labels start as each node's min direct neighbor (round 1 for free)
    labels = edges.groupby("node").aggregate(Min("nbr", alias_name="label"))
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "label": pa.compute.min_element_wise(t["node"], t["label"]),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    for _ in range(max_rounds):
        # message pass: neighbor labels flow along edges; groupby(node) min
        def attach(g: pd.DataFrame) -> pd.DataFrame:
            # g holds this node's label row(s) and its incident edges
            lab = g["label"].min()  # min skips the edge rows' nulls
            edge_nbrs = g["nbr"].dropna()
            nodes = list(edge_nbrs) + [g["node"].iloc[0]]
            return pd.DataFrame({"node": nodes, "cand": [lab] * len(nodes)})

        # union labels (as node,label) with edges (node,nbr) keyed by node
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "nbr": pa.nulls(t.num_rows, t["node"].type),
                 "label": t["label"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        edge_rows = edges.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "nbr": t["nbr"],
                 "label": pa.nulls(t.num_rows, t["node"].type)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        msgs = lab_rows.union(edge_rows).groupby("node").map_groups(
            attach, batch_format="pandas"
        )
        new_labels = msgs.groupby("node").aggregate(
            Min("cand", alias_name="label")
        ).materialize()
        # convergence: did any label shrink?
        old = labels.to_pandas().set_index("node")["label"]
        new = new_labels.to_pandas().set_index("node")["label"]
        changed = int((new.reindex(old.index) < old).sum())
        labels = new_labels
        if changed == 0:
            break
    # nullable unions push int labels through float64 in pandas; cast back
    return labels.map_batches(
        lambda t: pa.table(
            {
                id_col: t["node"],
                "cluster_id": pa.compute.cast(t["label"], t["node"].type),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
