"""1-D tolerance clustering — the engine's core grouping primitive.

Semantics match the reference (``/root/reference/pdfplumber/utils/clustering.py:9-66``):

- clustering is *chained* (transitive): on the sorted **distinct** values, a
  new cluster starts whenever the gap to the previous distinct value exceeds
  ``tolerance``;
- ``tolerance == 0`` puts every distinct value in its own cluster;
- objects are mapped to the cluster of their key value; when not preserving
  input order, objects are stably sorted by cluster id (so input order is
  kept *within* a cluster); when preserving order, *adjacent runs* of the
  same cluster id form the groups (itertools.groupby semantics — needed by
  ``use_text_flow``).

Vectorized here as: np.unique -> np.diff -> cumsum, which is exactly the
chained rule on sorted distinct values. This same shape is what the Spark
window plan (sort + lag + sum) computes distributed — see
``operators/clustering.py``.
"""

from __future__ import annotations

import numpy as np


def cluster_ids_for_distinct(sorted_distinct: np.ndarray, tolerance: float) -> np.ndarray:
    """Cluster ids (0..k-1) for an ascending array of distinct values."""
    n = len(sorted_distinct)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if tolerance == 0:
        return np.arange(n, dtype=np.int64)
    # Add-first operand order to match the reference exactly
    # (``utils/clustering.py:18`` tests ``x <= last + tolerance``): at float
    # boundaries ``b > a + tol`` and ``b - a > tol`` differ (e.g.
    # a=-0.99999, b=1e-05, tol=1: add-first splits, subtract-first merges).
    gaps = sorted_distinct[1:] > sorted_distinct[:-1] + tolerance
    out = np.zeros(n, dtype=np.int64)
    np.cumsum(gaps, out=out[1:])
    return out


def assign_clusters(values: np.ndarray, tolerance: float) -> np.ndarray:
    """Map each value (any order, repeats allowed) to its cluster id.

    Cluster ids are dense, ordered by ascending cluster position.
    """
    values = np.asarray(values, dtype=np.float64)
    distinct, inverse = np.unique(values, return_inverse=True)
    ids = cluster_ids_for_distinct(distinct, tolerance)
    return ids[inverse]


def cluster_list(values, tolerance: float = 0):
    """Group a list of numbers into chained clusters (sorted output).

    Returns a list of lists, like the reference's ``cluster_list`` — used by
    tier-1 unit tests ported from the reference.
    """
    arr = np.sort(np.asarray(list(values), dtype=np.float64))
    if len(arr) == 0:
        return []
    if tolerance == 0 or len(arr) < 2:
        return [[v] for v in arr.tolist()]
    # chained rule over *all* sorted values == chained rule over distincts
    # (add-first form; see cluster_ids_for_distinct)
    gaps = arr[1:] > arr[:-1] + tolerance
    bounds = np.flatnonzero(gaps) + 1
    return [chunk.tolist() for chunk in np.split(arr, bounds)]


def group_rows_by_cluster(cluster_of_row: np.ndarray, preserve_order: bool):
    """Row-index groups per cluster.

    - ``preserve_order=False``: one group per cluster id, ordered by cluster
      id; rows keep input order within the group (stable sort semantics).
    - ``preserve_order=True``: adjacent runs of equal cluster id (groupby
      semantics over the input sequence).

    Returns a list of np.ndarray of row indices.
    """
    cluster_of_row = np.asarray(cluster_of_row)
    n = len(cluster_of_row)
    if n == 0:
        return []
    if preserve_order:
        change = np.flatnonzero(np.diff(cluster_of_row) != 0) + 1
        return list(np.split(np.arange(n), change))
    order = np.argsort(cluster_of_row, kind="stable")
    sorted_ids = cluster_of_row[order]
    change = np.flatnonzero(np.diff(sorted_ids) != 0) + 1
    return list(np.split(order, change))
