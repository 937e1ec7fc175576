import numpy as np
import pytest

from pdfplumber_spark.kernel import cluster as K
from reforacle import ref_module


def test_cluster_list_tier1_literals():
    # ported from reference tests/test_utils.py:34-48
    a = [1, 2, 3, 4]
    assert K.cluster_list(a) == [[1], [2], [3], [4]]
    assert K.cluster_list(a, tolerance=1) == [[1, 2, 3, 4]]
    a = [1, 2, 5, 6]
    assert K.cluster_list(a, tolerance=1) == [[1, 2], [5, 6]]


def test_cluster_chained_transitivity():
    # chained: 1,2,3 with tol=1 all one cluster even though 3-1 > 1
    assert K.cluster_list([1, 3, 2], tolerance=1) == [[1, 2, 3]]


@pytest.mark.parametrize("seed", range(10))
def test_cluster_differential(seed):
    ref = ref_module("utils.clustering")
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(0, 50, size=rng.integers(1, 200)), 2)
    tol = float(rng.choice([0, 0.5, 1, 3]))
    expected = ref.cluster_list(vals.tolist(), tol)
    got = K.cluster_list(vals.tolist(), tol)
    assert [list(np.round(g, 6)) for g in got] == [
        list(np.round(g, 6)) for g in expected
    ]


@pytest.mark.parametrize("seed", range(5))
def test_assign_clusters_matches_make_cluster_dict(seed):
    ref = ref_module("utils.clustering")
    rng = np.random.default_rng(100 + seed)
    vals = np.round(rng.uniform(0, 30, size=150), 1)
    tol = 1.0
    d = ref.make_cluster_dict(vals.tolist(), tol)
    ids = K.assign_clusters(vals, tol)
    # same partition: map equality up to relabeling (both ordered ascending)
    assert all(d[v] == ids[i] for i, v in enumerate(vals.tolist()))


def test_group_rows_preserve_order_adjacency():
    # preserve_order groups only adjacent runs (use_text_flow semantics)
    ids = np.array([0, 0, 1, 0, 1, 1])
    groups = K.group_rows_by_cluster(ids, preserve_order=True)
    assert [g.tolist() for g in groups] == [[0, 1], [2], [3], [4, 5]]
    groups = K.group_rows_by_cluster(ids, preserve_order=False)
    assert [g.tolist() for g in groups] == [[0, 1, 3], [2, 4, 5]]
