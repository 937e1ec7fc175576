"""Lattice / stream / explicit table detection — per-page kernel.

Re-expresses ``/root/reference/pdfplumber/table.py`` columnar-first:

- ``snap_edges_frame`` / ``join_edges_frame`` / ``merge_edges_frame`` —
  tolerance snap to cluster means + interval union per infinite line
  (``table.py:21-98``);
- ``words_to_edges_h`` / ``words_to_edges_v`` — phantom edges from word
  alignment for the "text" strategy (``table.py:101-204``);
- ``find_intersections`` — v×h band θ-join, vectorized with numpy
  broadcasting instead of the reference's nested loop (``table.py:207-231``);
- ``intersections_to_cells`` — smallest-cell search per vertex
  (``table.py:234-294``), first-match-in-sorted-order semantics preserved;
- ``cells_to_tables`` — connected components by transitive corner sharing
  (union-find instead of the reference's fixed-point scan, same components
  and same output order: tables sorted by their (top, x0)-minimal corner,
  1-cell tables dropped, ``table.py:297-355``);
- ``table_rows`` / ``extract_table_text`` — row pivot against the distinct
  column x0 set (merged cell -> None) and per-cell text via the §2.8 kernel
  (``table.py:389-435``).

In the Spark engine this kernel runs per (url, page_number) inside a grouped
Arrow UDF; page-level cardinalities are tiny, so partitioning by url-hash is
the join locality and no cross-node shuffle occurs past the initial
repartition.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from .cluster import assign_clusters, group_rows_by_cluster
from .geom import (
    filter_edges_frame,
    frame_bbox,
    set_edge_coord,
    snap_frame,
)
from .layout import page_text
from .words import WordSettings

DEFAULT_SNAP_TOLERANCE = 3
DEFAULT_JOIN_TOLERANCE = 3
DEFAULT_MIN_WORDS_VERTICAL = 3
DEFAULT_MIN_WORDS_HORIZONTAL = 1

EDGE_COLS = [
    "x0", "x1", "top", "bottom", "width", "height", "orientation", "object_type",
]


def _dict_to_edges(obj: dict) -> List[dict]:
    """One object dict -> its edge dicts (reference utils.obj_to_edges,
    geometry.py:253-260) via the frame converters."""
    from .geom import curves_to_edges, lines_to_edges, rects_to_edges

    t = str(obj.get("object_type") or "")
    if "_edge" in t:
        return [obj]
    conv = {"line": lines_to_edges, "rect": rects_to_edges,
            "curve": curves_to_edges}.get(t)
    if conv is None:
        raise ValueError(f"cannot convert object_type {t!r} to edges")
    frame = conv(pd.DataFrame([obj]))
    return frame.to_dict("records")


def _edge_frame(rows: List[dict]) -> pd.DataFrame:
    df = pd.DataFrame(rows)
    for c in EDGE_COLS:
        if c not in df.columns:
            df[c] = np.nan if c not in ("orientation", "object_type") else None
    return df


def snap_edges_frame(
    edges: pd.DataFrame,
    x_tolerance: float = DEFAULT_SNAP_TOLERANCE,
    y_tolerance: float = DEFAULT_SNAP_TOLERANCE,
) -> pd.DataFrame:
    """Snap v edges on x0, h edges on top, to cluster means (``table.py:21-36``)."""
    v = edges[edges["orientation"] == "v"]
    h = edges[edges["orientation"] == "h"]
    return pd.concat(
        [snap_frame(v, "x0", x_tolerance), snap_frame(h, "top", y_tolerance)],
        ignore_index=True,
    )


def join_edges_frame(group: pd.DataFrame, orientation: str, tolerance: float) -> pd.DataFrame:
    """Interval-union of collinear segments (``table.py:39-65``).

    Classic merge: sort by start; a segment joins the current run when its
    start <= running max end + tolerance; the survivor is the run's first
    edge resized to the run's max end.
    """
    lo, hi = ("x0", "x1") if orientation == "h" else ("top", "bottom")
    order = np.argsort(group[lo].to_numpy(np.float64), kind="stable")
    g = group.iloc[order]
    starts = g[lo].to_numpy(np.float64)
    ends = g[hi].to_numpy(np.float64)
    run_max = np.maximum.accumulate(ends)
    new_run = np.zeros(len(g), dtype=bool)
    new_run[0] = True
    if len(g) > 1:
        new_run[1:] = starts[1:] > (run_max[:-1] + tolerance)
    run_id = np.cumsum(new_run) - 1
    out_rows = []
    for r in range(run_id[-1] + 1):
        m = run_id == r
        first = g.iloc[int(np.flatnonzero(m)[0]) : int(np.flatnonzero(m)[0]) + 1]
        max_end = float(ends[m].max())
        if max_end > float(first[hi].iloc[0]):
            first = set_edge_coord(first, hi, np.array([max_end]))
        out_rows.append(first)
    return pd.concat(out_rows, ignore_index=True)


def merge_edges_frame(
    edges: pd.DataFrame,
    snap_x_tolerance: float,
    snap_y_tolerance: float,
    join_x_tolerance: float,
    join_y_tolerance: float,
) -> pd.DataFrame:
    """snap (if tol > 0) then join per (orientation, position) group
    (``table.py:68-98``). Group order follows the reference's sort key
    ('h' groups by top first, then 'v' groups by x0)."""
    if len(edges) == 0:
        return edges
    if snap_x_tolerance > 0 or snap_y_tolerance > 0:
        edges = snap_edges_frame(edges, snap_x_tolerance, snap_y_tolerance)
    pos = np.where(
        edges["orientation"].to_numpy() == "h",
        edges["top"].to_numpy(np.float64),
        edges["x0"].to_numpy(np.float64),
    )
    df = edges.assign(_pos=pos)
    out = []
    for (ori, _), grp in df.groupby(["orientation", "_pos"], sort=True):
        tol = join_x_tolerance if ori == "h" else join_y_tolerance
        out.append(join_edges_frame(grp, ori, tol))
    return (
        pd.concat(out, ignore_index=True).drop(columns=["_pos"])
        if out
        else edges.iloc[0:0]
    )


def words_to_edges_h(
    words: pd.DataFrame, word_threshold: int = DEFAULT_MIN_WORDS_HORIZONTAL
) -> pd.DataFrame:
    """Phantom horizontal edges at tops+bottoms of word rows (``table.py:101-141``)."""
    if len(words) == 0:
        return _edge_frame([])
    cids = assign_clusters(words["top"].to_numpy(np.float64), 1)
    groups = [g for g in group_rows_by_cluster(cids, False) if len(g) >= word_threshold]
    if not groups:
        return _edge_frame([])
    rects = [
        (
            float(words["x0"].to_numpy()[g].min()),
            float(words["top"].to_numpy()[g].min()),
            float(words["x1"].to_numpy()[g].max()),
            float(words["bottom"].to_numpy()[g].max()),
        )
        for g in groups
    ]
    min_x0 = min(r[0] for r in rects)
    max_x1 = max(r[2] for r in rects)
    rows = []
    for rx0, rtop, rx1, rbottom in rects:
        for y in (rtop, rbottom):
            rows.append(
                {
                    "x0": min_x0,
                    "x1": max_x1,
                    "top": y,
                    "bottom": y,
                    "width": max_x1 - min_x0,
                    "height": 0.0,
                    "orientation": "h",
                    "object_type": "phantom_edge",
                }
            )
    return _edge_frame(rows)


def words_to_edges_v(
    words: pd.DataFrame, word_threshold: int = DEFAULT_MIN_WORDS_VERTICAL
) -> pd.DataFrame:
    """Phantom vertical edges from left/right/center word alignment
    (``table.py:144-204``). The greedy overlap condensation (first-come by
    descending cluster size) is order-dependent and kept sequential."""
    if len(words) == 0:
        return _edge_frame([])
    x0s = words["x0"].to_numpy(np.float64)
    x1s = words["x1"].to_numpy(np.float64)
    tops = words["top"].to_numpy(np.float64)
    bottoms = words["bottom"].to_numpy(np.float64)
    centers = (x0s + x1s) / 2.0

    clusters: List[np.ndarray] = []
    for vals in (x0s, x1s, centers):
        cids = assign_clusters(vals, 1)
        clusters.extend(group_rows_by_cluster(cids, False))

    # stable sort by descending size, keep >= threshold
    sizes = np.array([len(c) for c in clusters])
    order = np.argsort(-sizes, kind="stable")
    big = [clusters[i] for i in order if len(clusters[i]) >= word_threshold]

    bboxes = [
        (
            float(x0s[g].min()),
            float(tops[g].min()),
            float(x1s[g].max()),
            float(bottoms[g].max()),
        )
        for g in big
    ]

    condensed: List[Tuple[float, float, float, float]] = []
    for bbox in bboxes:
        overlaps = False
        for c in condensed:
            ow = min(bbox[2], c[2]) - max(bbox[0], c[0])
            oh = min(bbox[3], c[3]) - max(bbox[1], c[1])
            if ow >= 0 and oh >= 0 and (ow + oh) > 0:
                overlaps = True
                break
        if not overlaps:
            condensed.append(bbox)

    if not condensed:
        return _edge_frame([])
    sorted_boxes = sorted(condensed, key=lambda b: b[0])
    max_x1 = max(b[2] for b in sorted_boxes)
    min_top = min(b[1] for b in sorted_boxes)
    max_bottom = max(b[3] for b in sorted_boxes)
    rows = [
        {
            "x0": b[0],
            "x1": b[0],
            "top": min_top,
            "bottom": max_bottom,
            "width": 0.0,
            "height": max_bottom - min_top,
            "orientation": "v",
            "object_type": "phantom_edge",
        }
        for b in sorted_boxes
    ]
    rows.append(
        {
            "x0": max_x1,
            "x1": max_x1,
            "top": min_top,
            "bottom": max_bottom,
            "width": 0.0,
            "height": max_bottom - min_top,
            "orientation": "v",
            "object_type": "phantom_edge",
        }
    )
    return _edge_frame(rows)


def find_intersections(
    edges: pd.DataFrame, x_tolerance: float = 1, y_tolerance: float = 1
) -> Dict[Tuple[float, float], Dict[str, List[Tuple[float, float, float, float]]]]:
    """Vertex map {(x, top): {'v': [v bboxes], 'h': [h bboxes]}}.

    Band θ-join vectorized by numpy broadcasting over the (v, h) cross
    product (``table.py:207-231``); edge lists keep the reference's
    (x0, top)-sorted enumeration order.
    """
    v = edges[edges["orientation"] == "v"]
    h = edges[edges["orientation"] == "h"]
    if len(v) == 0 or len(h) == 0:
        return {}
    v = v.iloc[np.lexsort((v["top"].to_numpy(np.float64), v["x0"].to_numpy(np.float64)))]
    h = h.iloc[np.lexsort((h["x0"].to_numpy(np.float64), h["top"].to_numpy(np.float64)))]
    vx0 = v["x0"].to_numpy(np.float64)[:, None]
    vtop = v["top"].to_numpy(np.float64)[:, None]
    vbottom = v["bottom"].to_numpy(np.float64)[:, None]
    hx0 = h["x0"].to_numpy(np.float64)[None, :]
    hx1 = h["x1"].to_numpy(np.float64)[None, :]
    htop = h["top"].to_numpy(np.float64)[None, :]
    hit = (
        (vtop <= htop + y_tolerance)
        & (vbottom >= htop - y_tolerance)
        & (vx0 >= hx0 - x_tolerance)
        & (vx0 <= hx1 + x_tolerance)
    )
    vbox = list(zip(v["x0"], v["top"], v["x1"], v["bottom"]))
    hbox = list(zip(h["x0"], h["top"], h["x1"], h["bottom"]))
    out: Dict[Tuple[float, float], Dict[str, list]] = {}
    vi_arr, hi_arr = np.nonzero(hit)
    # iterate v-major (reference loop order) — nonzero already row-major
    for vi, hi in zip(vi_arr, hi_arr):
        vertex = (float(vx0[vi, 0]), float(htop[0, hi]))
        slot = out.setdefault(vertex, {"v": [], "h": []})
        slot["v"].append(vbox[vi])
        slot["h"].append(hbox[hi])
    return out


def intersections_to_cells(intersections) -> List[Tuple[float, float, float, float]]:
    """Smallest cell per vertex (``table.py:234-294``).

    For each vertex (in sorted order): scan candidates directly below and
    right; accept the first (below, right) pair whose 4th corner exists and
    whose 4 sides are each covered by a shared edge.
    """
    vsets = {p: set(d["v"]) for p, d in intersections.items()}
    hsets = {p: set(d["h"]) for p, d in intersections.items()}

    def connects(p1, p2) -> bool:
        if p1[0] == p2[0] and vsets[p1] & vsets[p2]:
            return True
        if p1[1] == p2[1] and hsets[p1] & hsets[p2]:
            return True
        return False

    points = sorted(intersections.keys())
    n = len(points)
    cells = []
    for i, pt in enumerate(points):
        if i == n - 1:
            break
        rest = points[i + 1 :]
        below = [x for x in rest if x[0] == pt[0]]
        right = [x for x in rest if x[1] == pt[1]]
        found = None
        for bp in below:
            if not connects(pt, bp):
                continue
            for rp in right:
                if not connects(pt, rp):
                    continue
                corner = (rp[0], bp[1])
                if (
                    corner in intersections
                    and connects(corner, rp)
                    and connects(corner, bp)
                ):
                    found = (pt[0], pt[1], corner[0], corner[1])
                    break
            if found:
                break
        if found:
            cells.append(found)
    return cells


def cells_to_tables(cells: List[Tuple[float, float, float, float]]) -> List[List[Tuple]]:
    """Group cells into tables by transitive corner sharing (union-find),
    then sort tables by (top, x0)-minimal corner and drop singletons
    (``table.py:297-355``)."""
    n = len(cells)
    if n == 0:
        return []
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    corner_owner: Dict[Tuple[float, float], int] = {}
    for i, (x0, top, x1, bottom) in enumerate(cells):
        for c in ((x0, top), (x0, bottom), (x1, top), (x1, bottom)):
            if c in corner_owner:
                union(corner_owner[c], i)
            else:
                corner_owner[c] = i

    comps: Dict[int, List[Tuple]] = {}
    for i, cell in enumerate(cells):
        comps.setdefault(find(i), []).append(cell)

    tables = sorted(comps.values(), key=lambda t: min((c[1], c[0]) for c in t))
    return [t for t in tables if len(t) > 1]


def table_rows(cells: List[Tuple[float, float, float, float]]):
    """Row structure: cells sorted by (top, x0), grouped by top, pivoted
    against the sorted distinct x0 set; missing -> None (``table.py:389-397``)."""
    _sorted = sorted(cells, key=lambda c: (c[1], c[0]))
    xs = sorted(set(c[0] for c in cells))
    rows = []
    i = 0
    while i < len(_sorted):
        y = _sorted[i][1]
        row_cells = []
        while i < len(_sorted) and _sorted[i][1] == y:
            row_cells.append(_sorted[i])
            i += 1
        xdict = {c[0]: c for c in row_cells}
        rows.append([xdict.get(x) for x in xs])
    return rows


def chars_in_bbox_mask(chars: pd.DataFrame, bbox) -> np.ndarray:
    """Center-point containment, half-open box (``table.py:404-410``)."""
    x0, top, x1, bottom = bbox
    vmid = (chars["top"].to_numpy(np.float64) + chars["bottom"].to_numpy(np.float64)) / 2
    hmid = (chars["x0"].to_numpy(np.float64) + chars["x1"].to_numpy(np.float64)) / 2
    return (hmid >= x0) & (hmid < x1) & (vmid >= top) & (vmid < bottom)


def extract_table_text(
    cells: List[Tuple[float, float, float, float]],
    page_chars: pd.DataFrame,
    text_settings: Optional[dict] = None,
) -> List[List[Optional[str]]]:
    """Per-cell text (``table.py:399-435``).

    IMPORTANT: chars come from the whole *page*, not a table crop
    (``table.py:401``); merged (missing) cells -> None, empty -> "".
    """
    ts = dict(text_settings or {})
    layout = bool(ts.pop("layout", False))
    ws_kwargs = {
        k: v for k, v in ts.items() if k in WordSettings.__dataclass_fields__
    }
    out = []
    for row in table_rows(cells):
        row_bbox = (
            min(c[0] for c in row if c),
            min(c[1] for c in row if c),
            max(c[2] for c in row if c),
            max(c[3] for c in row if c),
        )
        row_chars = page_chars[chars_in_bbox_mask(page_chars, row_bbox)]
        arr: List[Optional[str]] = []
        for cell in row:
            if cell is None:
                arr.append(None)
                continue
            cc = row_chars[chars_in_bbox_mask(row_chars, cell)]
            if len(cc) == 0:
                arr.append("")
                continue
            if layout:
                arr.append(
                    page_text(
                        cc,
                        WordSettings(**ws_kwargs),
                        layout=True,
                        layout_bbox=cell,
                        layout_width=cell[2] - cell[0],
                        layout_height=cell[3] - cell[1],
                    )
                )
            else:
                arr.append(page_text(cc, WordSettings(**ws_kwargs)))
        out.append(arr)
    return out


def find_tables_frame(
    edges: pd.DataFrame,
    words: Optional[pd.DataFrame] = None,
    page_bbox: Optional[Tuple[float, float, float, float]] = None,
    vertical_strategy: str = "lines",
    horizontal_strategy: str = "lines",
    explicit_vertical_lines: Optional[List[float]] = None,
    explicit_horizontal_lines: Optional[List[float]] = None,
    snap_tolerance: float = DEFAULT_SNAP_TOLERANCE,
    snap_x_tolerance: Optional[float] = None,
    snap_y_tolerance: Optional[float] = None,
    join_tolerance: float = DEFAULT_JOIN_TOLERANCE,
    join_x_tolerance: Optional[float] = None,
    join_y_tolerance: Optional[float] = None,
    edge_min_length: float = 3,
    min_words_vertical: int = DEFAULT_MIN_WORDS_VERTICAL,
    min_words_horizontal: int = DEFAULT_MIN_WORDS_HORIZONTAL,
    intersection_tolerance: float = 3,
    intersection_x_tolerance: Optional[float] = None,
    intersection_y_tolerance: Optional[float] = None,
    debug: bool = False,
) -> List[List[Tuple[float, float, float, float]]]:
    """The TableFinder pipeline (``table.py:566-671``): strategy matrix ->
    merge_edges -> min-length filter -> intersections -> cells -> tables.
    Returns a list of tables, each a list of cell bboxes."""
    snap_x = snap_tolerance if snap_x_tolerance is None else snap_x_tolerance
    snap_y = snap_tolerance if snap_y_tolerance is None else snap_y_tolerance
    join_x = join_tolerance if join_x_tolerance is None else join_x_tolerance
    join_y = join_tolerance if join_y_tolerance is None else join_y_tolerance
    int_x = intersection_tolerance if intersection_x_tolerance is None else intersection_x_tolerance
    int_y = intersection_tolerance if intersection_y_tolerance is None else intersection_y_tolerance

    parts = []
    for ori, strat, explicit, w2e, min_words in (
        ("v", vertical_strategy, explicit_vertical_lines, words_to_edges_v, min_words_vertical),
        ("h", horizontal_strategy, explicit_horizontal_lines, words_to_edges_h, min_words_horizontal),
    ):
        if strat == "explicit" and (explicit is None or len(explicit) < 2):
            raise ValueError(
                f"explicit strategy for {ori} requires >= 2 explicit lines"
            )
        if strat == "lines":
            base = filter_edges_frame(edges, ori)
        elif strat == "lines_strict":
            base = filter_edges_frame(edges, ori, edge_type="line")
        elif strat == "text":
            if words is None:
                raise ValueError("text strategy requires words")
            base = w2e(words, min_words)
        elif strat == "explicit":
            base = _edge_frame([])
        else:
            raise ValueError(strat)
        parts.append(base)
        exp_rows = []
        for val in explicit or []:
            if isinstance(val, dict):
                # object descriptor (reference utils.obj_to_edges,
                # geometry.py:253-260): an *_edge passes through, a
                # line/rect/curve converts to its edges; only edges of
                # this orientation are kept (table.py:601-607)
                exp_rows.extend(
                    e for e in _dict_to_edges(val) if e["orientation"] == ori
                )
                continue
            if page_bbox is None:
                raise ValueError("explicit numeric lines require page_bbox")
            if ori == "v":
                exp_rows.append(
                    {
                        "x0": val, "x1": val,
                        "top": page_bbox[1], "bottom": page_bbox[3],
                        "width": 0.0, "height": page_bbox[3] - page_bbox[1],
                        "orientation": "v", "object_type": "explicit_edge",
                    }
                )
            else:
                exp_rows.append(
                    {
                        "x0": page_bbox[0], "x1": page_bbox[2],
                        "top": val, "bottom": val,
                        "width": page_bbox[2] - page_bbox[0], "height": 0.0,
                        "orientation": "h", "object_type": "explicit_edge",
                    }
                )
        if exp_rows:
            parts.append(_edge_frame(exp_rows))

    all_edges = pd.concat(
        [p for p in parts if len(p)], ignore_index=True
    ) if any(len(p) for p in parts) else _edge_frame([])
    merged = merge_edges_frame(all_edges, snap_x, snap_y, join_x, join_y)
    final = filter_edges_frame(merged, min_length=edge_min_length)
    vertices = find_intersections(final, int_x, int_y)
    cells = intersections_to_cells(vertices)
    tables = cells_to_tables(cells)
    if debug:
        # TableFinder debug surface (reference page.py:427-431: the
        # intermediate pipeline state for inspection)
        return {
            "edges": final.to_dict("records"),
            "intersections": vertices,
            "cells": cells,
            "tables": tables,
        }
    return tables
