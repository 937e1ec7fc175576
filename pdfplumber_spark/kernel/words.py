"""Char -> word assembly, vectorized over pandas frames.

Re-expresses the reference's ``WordExtractor``
(``/root/reference/pdfplumber/utils/text.py:423-688``) as columnar passes:

1. *adjacent* grouping by (upright, extra_attrs) — change-flag cumsum over
   ingestion order (itertools.groupby semantics, ``text.py:667-668``);
2. per group: cluster chars into lines on the line-direction key
   (``text.py:641-657``), chained tolerance clustering on distinct values;
3. stable sort within each line by the char-direction key (``text.py:661``);
4. word-boundary flags over the line sequence (``char_begins_new_word``,
   ``text.py:516-591``): regression (cx < ax), intra-line gap measured
   prev-END -> curr-START (cx > bx + x_tol), inter-line TOP -> TOP
   (cy > ay + y_tol); blanks end words; split-at-punctuation chars become
   single-char words (``text.py:593-639``);
5. word merge: bbox agg + ordered concat with ligature expansion + first-char
   attrs (``text.py:490-514``).

All boundary flags are computed with numpy shifts — no per-row Python in the
hot path; only the small per-(upright)-group loop remains Python.
"""

from __future__ import annotations

import string as _string
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from .cluster import assign_clusters

DEFAULT_X_TOLERANCE = 3.0
DEFAULT_Y_TOLERANCE = 3.0

LIGATURES = {
    "ﬀ": "ff",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬆ": "st",
    "ﬅ": "st",
}

_VALID_DIRS = {"ttb", "btt", "ltr", "rtl"}


def validate_directions(line_dir: str, char_dir: str, suffix: str = "") -> None:
    if line_dir not in _VALID_DIRS:
        raise ValueError(f"line_dir{suffix} must be one of {_VALID_DIRS}, not {line_dir}")
    if char_dir not in _VALID_DIRS:
        raise ValueError(f"char_dir{suffix} must be one of {_VALID_DIRS}, not {char_dir}")
    if set(line_dir) == set(char_dir):
        raise ValueError(
            f"line_dir{suffix}={line_dir} is incompatible with char_dir{suffix}={char_dir}"
        )


@dataclass
class WordSettings:
    """Mirror of the WordExtractor kwargs (``text.py:424-476``)."""

    x_tolerance: float = DEFAULT_X_TOLERANCE
    y_tolerance: float = DEFAULT_Y_TOLERANCE
    x_tolerance_ratio: Optional[float] = None
    y_tolerance_ratio: Optional[float] = None
    keep_blank_chars: bool = False
    use_text_flow: bool = False
    vertical_ttb: bool = True
    horizontal_ltr: bool = True
    line_dir: str = "ttb"
    char_dir: str = "ltr"
    line_dir_rotated: Optional[str] = None
    char_dir_rotated: Optional[str] = None
    extra_attrs: Sequence[str] = field(default_factory=tuple)
    split_at_punctuation: object = False
    expand_ligatures: bool = True

    def __post_init__(self):
        self._line_dir_rotated = self.line_dir_rotated or self.char_dir
        self._char_dir_rotated = self.char_dir_rotated or self.line_dir
        validate_directions(self.line_dir, self.char_dir)
        validate_directions(self._line_dir_rotated, self._char_dir_rotated, "_rotated")
        if self.split_at_punctuation is True:
            self._punct = _string.punctuation
        else:
            self._punct = self.split_at_punctuation or ""
        self._expansions = LIGATURES if self.expand_ligatures else {}

    def char_dir_for(self, upright: int) -> str:
        # deprecation shims first (text.py:478-488)
        if not upright and not self.vertical_ttb:
            return "btt"
        if upright and not self.horizontal_ltr:
            return "rtl"
        return self.char_dir if upright else self._char_dir_rotated

    def line_dir_for(self, upright: int) -> str:
        return self.line_dir if upright else self._line_dir_rotated


def line_cluster_values(df: pd.DataFrame, line_dir: str) -> np.ndarray:
    """Line-clustering key per char (``text.py:45-51``)."""
    if line_dir == "ttb":
        return df["top"].to_numpy(dtype=np.float64)
    if line_dir == "btt":
        return -df["bottom"].to_numpy(dtype=np.float64)
    if line_dir == "ltr":
        return df["x0"].to_numpy(dtype=np.float64)
    return -df["x1"].to_numpy(dtype=np.float64)  # rtl


def char_sort_keys(df: pd.DataFrame, char_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Primary+secondary in-line sort key per char (``text.py:54-60``)."""
    if char_dir == "ttb":
        return df["top"].to_numpy(np.float64), df["bottom"].to_numpy(np.float64)
    if char_dir == "btt":
        t = df["top"].to_numpy(np.float64)
        h = df["height"].to_numpy(np.float64)
        return -(t + h), -t
    if char_dir == "ltr":
        x = df["x0"].to_numpy(np.float64)
        return x, x
    return -df["x1"].to_numpy(np.float64), -df["x0"].to_numpy(np.float64)  # rtl


def _boundary_flags(
    line: pd.DataFrame, direction: str, s: WordSettings
) -> np.ndarray:
    """New-word flags over one line's chars (already in final char order).

    Implements the stateful splitter (``text.py:593-639``) as shift ops:
    the reference's ``current_word[-1]`` is always the previous *kept*
    (non-blank) char, and forced boundaries occur at/after punctuation
    words and after dropped blanks.
    """
    n = len(line)
    text = line["text"].to_numpy(dtype=object)
    is_blank = np.array(
        [bool(t) and str(t).isspace() and not s.keep_blank_chars for t in text]
    )
    punct = s._punct
    is_punct = (
        np.array([str(t) in punct for t in text]) if punct else np.zeros(n, bool)
    )
    # blanks cannot simultaneously be punctuation splits (blank test first)
    is_punct &= ~is_blank

    kept = np.flatnonzero(~is_blank)
    if len(kept) == 0:
        return np.zeros(n, dtype=np.int64) - 1  # all dropped

    if direction in ("ltr", "rtl"):
        xt, yt = None, None
        if direction == "ltr":
            ax = line["x0"].to_numpy(np.float64)
            bx = line["x1"].to_numpy(np.float64)
            cx = line["x0"].to_numpy(np.float64)
        else:
            ax = -line["x1"].to_numpy(np.float64)
            bx = -line["x0"].to_numpy(np.float64)
            cx = -line["x1"].to_numpy(np.float64)
        ay = line["top"].to_numpy(np.float64)
        cy = line["top"].to_numpy(np.float64)
        x_is_x = True
    else:
        if direction == "ttb":
            ax = line["top"].to_numpy(np.float64)
            bx = line["bottom"].to_numpy(np.float64)
            cx = line["top"].to_numpy(np.float64)
        else:
            ax = -line["bottom"].to_numpy(np.float64)
            bx = -line["top"].to_numpy(np.float64)
            cx = -line["bottom"].to_numpy(np.float64)
        ay = line["x0"].to_numpy(np.float64)
        cy = line["x0"].to_numpy(np.float64)
        x_is_x = False

    size = line["size"].to_numpy(np.float64) if "size" in line.columns else None

    prev = kept[:-1]
    curr = kept[1:]
    # intra/inter tolerance assignment swaps for vertical text (text.py:557-575)
    if x_is_x:
        xtol = (
            np.full(len(prev), s.x_tolerance)
            if s.x_tolerance_ratio is None or size is None
            else s.x_tolerance_ratio * size[prev]
        )
        ytol = (
            np.full(len(prev), s.y_tolerance)
            if s.y_tolerance_ratio is None or size is None
            else s.y_tolerance_ratio * size[prev]
        )
    else:
        xtol = (
            np.full(len(prev), s.y_tolerance)
            if s.y_tolerance_ratio is None or size is None
            else s.y_tolerance_ratio * size[prev]
        )
        ytol = (
            np.full(len(prev), s.x_tolerance)
            if s.x_tolerance_ratio is None or size is None
            else s.x_tolerance_ratio * size[prev]
        )

    geo_break = (
        (cx[curr] < ax[prev])
        | (cx[curr] > bx[prev] + xtol)
        | (cy[curr] > ay[prev] + ytol)
    )
    forced = (
        is_punct[curr]
        | is_punct[prev]
        | ((curr - prev) > 1)  # a dropped blank intervened
    )
    new_flag = np.empty(len(kept), dtype=bool)
    new_flag[0] = True
    new_flag[1:] = forced | geo_break

    word_of_kept = np.cumsum(new_flag) - 1
    out = np.full(n, -1, dtype=np.int64)
    out[kept] = word_of_kept
    return out


def extract_words_frame(
    chars: pd.DataFrame, settings: Optional[WordSettings] = None
) -> Tuple[pd.DataFrame, np.ndarray]:
    """Extract words from a char frame (one page, ingestion order).

    Returns ``(words, char_word_id, char_word_pos)`` where ``words`` has one
    row per word in the reference's emission order, ``char_word_id[i]`` maps
    the i-th char row to its word index (-1 = dropped blank) and
    ``char_word_pos[i]`` is the char's position within its word (assignment
    order — differs from input order for btt/rtl lines). Word columns: text,
    x0, x1, top, doctop, bottom, upright, height, width, direction
    (+extra_attrs).
    """
    s = settings or WordSettings()
    n = len(chars)
    char_word_id = np.full(n, -1, dtype=np.int64)
    char_word_pos = np.full(n, -1, dtype=np.int64)
    word_rows: list = []
    if n == 0:
        cols = ["text", "x0", "x1", "top", "doctop", "bottom", "upright",
                "height", "width", "direction", *s.extra_attrs]
        return pd.DataFrame(columns=cols), char_word_id, char_word_pos

    chars = chars.reset_index(drop=True)

    # 1. adjacent grouping by (upright, *extra_attrs)
    gkey_cols = ["upright", *s.extra_attrs]
    change = np.zeros(n, dtype=bool)
    for c in gkey_cols:
        v = chars[c].to_numpy()
        change[1:] |= v[1:] != v[:-1]
    change[0] = True
    group_ids = np.cumsum(change) - 1

    next_word = 0
    for g in range(group_ids[-1] + 1):
        gidx = np.flatnonzero(group_ids == g)
        gdf = chars.iloc[gidx]
        upright = int(gdf["upright"].iloc[0])
        char_dir = s.char_dir_for(upright)

        if s.use_text_flow:
            # single pseudo-line in ingestion order; direction = configured
            # char_dir regardless of upright (text.py:671-674)
            line_slices = [np.arange(len(gidx))]
            direction = s.char_dir
        else:
            line_dir = s.line_dir_for(upright)
            vals = line_cluster_values(gdf, line_dir)
            tol = s.y_tolerance if line_dir in ("ttb", "btt") else s.x_tolerance
            cids = assign_clusters(vals, tol)
            # groups ordered by cluster id; stable within (clustering.py:60-66)
            order = np.argsort(cids, kind="stable")
            sorted_cids = cids[order]
            bounds = np.flatnonzero(np.diff(sorted_cids) != 0) + 1
            line_slices = np.split(order, bounds)
            direction = char_dir

        for sl in line_slices:
            ldf = gdf.iloc[sl]
            if not s.use_text_flow:
                k1, k2 = char_sort_keys(ldf, direction)
                sort_order = np.lexsort((k2, k1))  # stable: last key primary
                # np.lexsort is stable w.r.t. input order for ties
                ldf = ldf.iloc[sort_order]
            wids = _boundary_flags(ldf, direction, s)
            kept_mask = wids >= 0
            if not kept_mask.any():
                continue
            n_words = int(wids[kept_mask].max()) + 1
            # ldf row i corresponds to original char row gidx[sl][sort_order][i]
            if not s.use_text_flow:
                orig_rows = gidx[sl][sort_order]
            else:
                orig_rows = gidx[sl]
            kept_wids = wids[kept_mask]
            char_word_id[orig_rows[kept_mask]] = kept_wids + next_word
            # position within word: kept_wids is nondecreasing over line order
            starts = np.flatnonzero(
                np.concatenate(([True], np.diff(kept_wids) != 0))
            )
            run_start_of = starts[np.searchsorted(starts, np.arange(len(kept_wids)), "right") - 1]
            char_word_pos[orig_rows[kept_mask]] = np.arange(len(kept_wids)) - run_start_of

            # merge words (text.py:490-514)
            txt = ldf["text"].to_numpy(dtype=object)
            if s._expansions:
                txt = np.array(
                    [s._expansions.get(t, t) for t in txt], dtype=object
                )
            x0 = ldf["x0"].to_numpy(np.float64)
            x1 = ldf["x1"].to_numpy(np.float64)
            top = ldf["top"].to_numpy(np.float64)
            bottom = ldf["bottom"].to_numpy(np.float64)
            doctop = (
                ldf["doctop"].to_numpy(np.float64)
                if "doctop" in ldf.columns
                else top
            )
            for w in range(n_words):
                m = wids == w
                first = int(np.flatnonzero(m)[0])
                wx0 = float(x0[m].min())
                wx1 = float(x1[m].max())
                wtop = float(top[m].min())
                wbottom = float(bottom[m].max())
                doctop_adj = float(doctop[first] - top[first])
                row = {
                    "text": "".join(txt[m]),
                    "x0": wx0,
                    "x1": wx1,
                    "top": wtop,
                    "doctop": wtop + doctop_adj,
                    "bottom": wbottom,
                    "upright": upright,
                    "height": wbottom - wtop,
                    "width": wx1 - wx0,
                    "direction": direction,
                }
                for a in s.extra_attrs:
                    row[a] = ldf[a].iloc[first]
                word_rows.append(row)
            next_word += n_words

    cols = ["text", "x0", "x1", "top", "doctop", "bottom", "upright",
            "height", "width", "direction", *s.extra_attrs]
    words = pd.DataFrame(word_rows, columns=cols)
    return words, char_word_id, char_word_pos


def dedupe_chars_frame(chars: pd.DataFrame, tolerance: float = 1) -> pd.DataFrame:
    """Drop near-duplicate chars (``text.py:784-804``).

    Within each (fontname, size, upright, text) group, cluster positions on
    doctop then x0 (chained, tolerance) and keep the (doctop, x0)-minimum of
    each 2-D cluster; output restored to ingestion order.
    """
    if len(chars) == 0:
        return chars
    df = chars.reset_index(drop=True)
    key_cols = ["fontname", "size", "upright", "text"]
    keep = np.zeros(len(df), dtype=bool)
    for _, grp in df.groupby(key_cols, sort=False):
        dt = grp["doctop"].to_numpy(np.float64)
        ycl = assign_clusters(dt, tolerance)
        for yc in np.unique(ycl):
            sub = grp.iloc[np.flatnonzero(ycl == yc)]
            xcl = assign_clusters(sub["x0"].to_numpy(np.float64), tolerance)
            for xc in np.unique(xcl):
                cell = sub.iloc[np.flatnonzero(xcl == xc)]
                # keep min (doctop, x0)
                k = np.lexsort(
                    (cell["x0"].to_numpy(np.float64), cell["doctop"].to_numpy(np.float64))
                )[0]
                keep[cell.index[k]] = True
    return df[keep]
