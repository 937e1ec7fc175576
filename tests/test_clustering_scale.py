"""Scale-safe global clustering: the unpartitioned forms of with_cluster_id
and interval_merge must (a) avoid the single-task global window on the big
table — range-partition + boundary fix-up instead — and (b) produce EXACTLY
the single-pass reference semantics (utils/clustering.py chained gaps;
table.py:39-65 running-max interval union)."""

import numpy as np
import pandas as pd
import pytest

from pdfplumber_spark.operators.clustering import interval_merge, with_cluster_id


def _ref_cluster(vals, tol):
    vals = sorted(set(vals))
    cid, out = 0, {}
    for i, v in enumerate(vals):
        if i and v - vals[i - 1] > tol:
            cid += 1
        out[v] = cid
    return out


def _ref_interval_merge(rows, tol):
    rows = sorted(rows)
    segs = []
    runmax = None
    for s, e in rows:
        if runmax is None or s > runmax + tol:
            segs.append([s, e, 1])
            runmax = e
        else:
            segs[-1][1] = max(segs[-1][1], e)
            segs[-1][2] += 1
            runmax = max(runmax, e)
    return sorted((a, b, c) for a, b, c in segs)


@pytest.mark.parametrize("n,spread", [(200, 50.0), (5000, 50.0), (37, 3.0), (1, 10.0)])
def test_global_cluster_matches_reference(spark, n, spread):
    rng = np.random.default_rng(5 + n)
    vals = np.round(rng.uniform(0, spread, n), 2)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = with_cluster_id(df, "v", tolerance=1.0).toPandas()
    exp = _ref_cluster(vals.tolist(), 1.0)
    assert all(exp[round(r.v, 2)] == r.cluster_id for r in got.itertuples())


@pytest.mark.parametrize("n", [200, 5000, 1])
def test_global_interval_merge_matches_reference(spark, n):
    rng = np.random.default_rng(11 + n)
    s = np.round(rng.uniform(0, 100, n), 2)
    e = s + np.round(rng.uniform(0, 5, n), 2)
    idf = spark.createDataFrame(pd.DataFrame({"s": s, "e": e}))
    got = sorted(
        (round(r.s, 6), round(r.e, 6), int(r.n_merged))
        for r in interval_merge(idf, "s", "e", tolerance=0.5)
        .toPandas()
        .itertuples()
    )
    exp = [
        (round(a, 6), round(b, 6), c)
        for a, b, c in _ref_interval_merge(list(zip(s.tolist(), e.tolist())), 0.5)
    ]
    assert got == exp


def test_cluster_id_stage_is_range_partitioned(spark):
    """The big-table cluster-id stage must be range-partitioned (>1 task),
    not a global single-partition window (VERDICT r1 'What's wrong' #3)."""
    rng = np.random.default_rng(3)
    d = spark.createDataFrame(pd.DataFrame({"v": rng.uniform(0, 1000, 20000)}))
    plan = (
        with_cluster_id(d, "v", 0.001)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower()
