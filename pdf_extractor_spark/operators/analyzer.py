"""Vectorized (Arrow-batch) implementation of the reference's 3-pass
heading heuristic (SURVEY.md §2.4-§2.9; reference: utils/analysis_new.py).

Design: passes 1-2 (derived columns, lag window, font histogram,
scoring) are vectorized with pandas/numpy ACROSS every document in an
Arrow batch at once — no per-row Python in the bulk path. Pass 3
(title reconstruction, poster grouping, level assignment) is
order-/path-dependent greedy logic over each document's *candidate*
blocks (a handful of rows), executed per document over numpy arrays.

Byte-identity notes (each rule cites the reference line):
- text strip / isupper / istitle use pandas object-dtype ``.str`` ops,
  which apply true Python-unicode semantics (analysis_new.py:8,30-33).
- numbering patterns are anchored matches tried in priority order, so
  "I." tags as 'A.' while "IV." tags as 'I.' (analysis_new.py:35-40).
- the modal baseline size tie-breaks by FIRST occurrence in body order,
  matching Counter.most_common's stable heap (analysis_new.py:69).
- cluster keys use Python round() = banker's rounding
  (analysis_new.py:341).
- the final outline sort key replicates the first-text-match y lookup
  (analysis_new.py:395) which in practice never matches (outline texts
  carry a trailing space) → stable by-page sort.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Iterator, Optional

import numpy as np
import pandas as pd

BLOCK_COLS = [
    "url",
    "block_idx",
    "page_num",
    "text",
    "font_size",
    "font_name",
    "x0",
    "y0",
    "x1",
    "y1",
    "page_width",
]

_NUMBERING_PATTERNS = [
    (r"\d+\.\d+\.\d+", "x.y.z."),
    (r"\d+\.\d+", "x.y."),
    (r"\d+\.", "x."),
    (r"[A-Z]\.", "A."),
    (r"[IVX]+\.", "I."),
]

# One alternation replaces the per-pattern sequential try: Python `re`
# attempts alternatives LEFT TO RIGHT at the anchor, so the first group
# that matches is exactly the first pattern that would have matched in
# _NUMBERING_PATTERNS order — including the "I." → 'A.' quirk
# (analysis_new.py:35-40). `m.lastindex` is the matching alternative
# (each alternative is one group; only one can participate).
_NUMBERING_ALT = re.compile("|".join(f"({pat})" for pat, _ in _NUMBERING_PATTERNS))
_NUMBERING_TAGS = [None] + [tag for _, tag in _NUMBERING_PATTERNS]
_BOLD_RE = re.compile(r"bold|black|heavy|demi|semi")


def featurize(blocks: pd.DataFrame) -> pd.DataFrame:
    """Pass 1 + derived columns, vectorized across all documents.

    Input must be ordered by (url, block_idx) — ordering is data, not
    an accident (SURVEY.md §1.2).

    The text-derived columns are computed in ONE Python pass per row
    (str.strip / str.isupper / str.istitle are the same Python-unicode
    methods pandas' object-dtype ``.str`` accessors dispatch to
    elementwise, analysis_new.py:8,30-33); `match(s, 0, 20)` truncates
    the subject at endpos=20 exactly like the previous
    ``.str.slice(0, 20)``.
    """
    df = blocks.copy()
    texts = df["text"].tolist()
    n = len(texts)
    stripped = [t.strip() for t in texts]
    case = np.empty(n, dtype=object)
    numbering = np.empty(n, dtype=object)
    _num_match = _NUMBERING_ALT.match
    for i, s in enumerate(stripped):
        case[i] = "UPPER" if s.isupper() else ("Title Case" if s.istitle() else "Lower")
        m = _num_match(s, 0, 20)
        numbering[i] = _NUMBERING_TAGS[m.lastindex] if m is not None else None
    df["text"] = stripped
    df["char_count"] = np.fromiter((len(s) for s in stripped), dtype=np.int64, count=n)
    df["is_bold"] = np.fromiter(
        (_BOLD_RE.search(f.lower()) is not None for f in df["font_name"].tolist()),
        dtype=bool,
        count=n,
    )
    df["text_case"] = case
    df["numbering"] = numbering
    g = df.groupby("url", sort=False)
    prev_page = g["page_num"].shift()
    prev_y1 = g["y1"].shift()
    same_page = (prev_page == df["page_num"]).fillna(False).to_numpy(dtype=bool)
    df["space_above"] = np.where(same_page, df["y0"] - prev_y1, 0.0)
    pw = df["page_width"]
    df["is_centered"] = np.abs(pw / 2 - (df["x0"] + df["x1"]) / 2) < pw * 0.2
    return df


def doc_stats(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, list[float]]]:
    """Pass 2 aggregates: per-url modal baseline size + heading tiers.

    Returns (baseline frame [url, baseline], {url: tiers}).
    """
    is_body = (df["char_count"] > 10) & (df["font_size"] >= 8)
    has_body = is_body.groupby(df["url"], sort=False).transform("any")
    eff = is_body | ~has_body  # per-url fallback to ALL blocks (analysis_new.py:67)
    body = df.loc[eff, ["url", "font_size", "block_idx", "page_num"]]

    hist = (
        body.groupby(["url", "font_size"], sort=False)
        .agg(cnt=("block_idx", "size"), first_idx=("block_idx", "min"), max_page=("page_num", "max"))
        .reset_index()
    )
    # modal size, tie-break = first encountered (stable sort on first_idx)
    ordered = hist.sort_values(
        ["url", "cnt", "first_idx"], ascending=[True, False, True], kind="mergesort"
    )
    baseline = (
        ordered.groupby("url", sort=False)
        .head(1)[["url", "font_size"]]
        .rename(columns={"font_size": "baseline"})
    )

    h = hist.merge(baseline, on="url")
    tier_rows = h[
        (h["font_size"] >= h["baseline"] * 1.15)
        & ((h["cnt"] >= 2) | (h["font_size"] >= h["baseline"] * 1.5))
        & (h["max_page"] > 0)
    ]
    raw = (
        tier_rows.sort_values(["url", "font_size"], ascending=[True, False])
        .groupby("url", sort=False)["font_size"]
        .agg(list)
    )

    def trim(ts: list[float]) -> list[float]:
        # outlier-top trim (analysis_new.py:83-86)
        if len(ts) >= 2 and ts[0] > ts[1] * 1.3:
            return ts[1:5]
        return ts[:4]

    tiers = {url: trim(ts) for url, ts in raw.items()}
    return baseline, tiers


def score(df: pd.DataFrame, baseline: pd.DataFrame, tiers: dict[str, list[float]]) -> pd.DataFrame:
    """Pass 2 scoring chain (C1-C8), fully vectorized."""
    out = df.merge(baseline, on="url", how="left")
    out["baseline"] = out["baseline"].fillna(0.0)
    tier_frame = pd.DataFrame(
        [
            (url, size, idx)
            for url, ts in tiers.items()
            for idx, size in enumerate(ts)
        ],
        columns=["url", "font_size", "tier_index"],
    )
    if len(tier_frame):
        out = out.merge(tier_frame, on=["url", "font_size"], how="left")
    else:
        out["tier_index"] = np.nan

    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(out["baseline"] > 0, out["font_size"] / out["baseline"], 0.0)
    in_tier = out["tier_index"].notna().to_numpy()
    tier_idx = out["tier_index"].fillna(0).to_numpy()
    cc = out["char_count"].to_numpy()

    s = np.select(
        [in_tier, ratio >= 2.0, ratio >= 1.5, ratio >= 1.2, ratio >= 1.1],
        [25 - tier_idx * 3, 20, 15, 10, 5],
        default=0,
    ).astype("float64")
    s += np.where(out["is_bold"], np.where(ratio >= 1.3, 12, 8), 0)
    s += np.where(out["numbering"].notna(), 18, 0)
    s += np.select([out["text_case"] == "UPPER", out["text_case"] == "Title Case"], [6, 4], 0)
    s += np.where(out["space_above"] > out["baseline"] * 1.5, 10, 0)
    s += np.where(out["is_centered"] & (ratio >= 1.2), 8, 0)
    s += np.select([cc < 4, cc <= 50, cc > 100], [-8, 2, -5], 0)
    s += np.where(out["font_size"] < out["baseline"] * 0.95, -8, 0)
    out["score"] = s
    return out


# ----------------------------------------------------------------------
# Pass 3 — per-document classification over numpy arrays.
# ----------------------------------------------------------------------
_VERSION_RX = re.compile(r"Version \d+\.\d+", re.I)
_LETTER_RX = re.compile(r"[A-Za-z]")
_LETTER_BANG_RX = re.compile(r"[A-Za-z!]")
_CONTACT_RX = re.compile(r"www\.|\.com|@|\d{5}|\(\d{3}\)")
_DIGITS_ONLY_RX = re.compile(r"^[\d\s\-\(\)\.]+$")
_POSTER_KEYS = ("party", "invited", "rsvp", "hope", "see you", "address:")
_FORM_KEYS = ("date:", "time:", "for:", "address:", "rsvp:")
_FIELD_LABELS = frozenset({"ADDRESS:", "RSVP:", "DATE:", "TIME:", "FOR:"})


class _Doc:
    """Column-array view of one document's blocks, in insertion order."""

    __slots__ = (
        "text", "size", "page", "y", "x0", "x1", "y1",
        "bold", "case", "numbering", "centered", "score", "n",
    )

    def __init__(self, cols: "_BatchCols", idx):
        # fancy-index the BATCH-level numpy arrays: extracting pandas
        # columns per document costs ~12 __getitem__/to_numpy calls per
        # doc (measured ~20% of the whole Arrow stage); pulling each
        # column once per batch and slicing is pure numpy
        self.text = cols.text[idx]
        self.size = cols.size[idx]
        self.page = cols.page[idx]
        self.y = cols.y[idx]
        self.x0 = cols.x0[idx]
        self.x1 = cols.x1[idx]
        self.y1 = cols.y1[idx]
        self.bold = cols.bold[idx]
        self.case = cols.case[idx]
        self.numbering = cols.numbering[idx]
        self.centered = cols.centered[idx]
        self.score = cols.score[idx]
        self.n = len(idx)


class _BatchCols:
    """All 12 _Doc columns extracted ONCE for a whole scored batch."""

    __slots__ = _Doc.__slots__

    def __init__(self, scored: pd.DataFrame):
        self.text = scored["text"].to_numpy(dtype=object)
        self.size = scored["font_size"].to_numpy(dtype=float)
        self.page = scored["page_num"].to_numpy(dtype=int)
        self.y = scored["y0"].to_numpy(dtype=float)
        self.x0 = scored["x0"].to_numpy(dtype=float)
        self.x1 = scored["x1"].to_numpy(dtype=float)
        self.y1 = scored["y1"].to_numpy(dtype=float)
        self.bold = scored["is_bold"].to_numpy(dtype=bool)
        self.case = scored["text_case"].to_numpy(dtype=object)
        self.numbering = scored["numbering"].to_numpy(dtype=object)
        self.centered = scored["is_centered"].to_numpy(dtype=bool)
        self.score = scored["score"].to_numpy(dtype=float)
        self.n = len(scored)


def _candidate_indices(d: _Doc, baseline: float, poster_v1: bool) -> list[int]:
    """F1-F4 candidate gates (analysis_new.py:126-144)."""
    keep = []
    letter_rx = _LETTER_BANG_RX if poster_v1 else _LETTER_RX
    for i in range(d.n):
        t = d.text[i]
        if d.score[i] < 20 or not letter_rx.search(t):
            continue
        if _VERSION_RX.match(t):
            continue
        if poster_v1:
            if d.size[i] < baseline * 1.3 and d.score[i] < 30:
                continue
            cc = len(t)
            if cc < 8 and not d.size[i] > baseline * 1.5 and cc > 1:
                continue
        else:
            if d.numbering[i] is None and d.size[i] < baseline * 1.05:
                continue
        keep.append(i)
    return keep


def _multipage_title(d: _Doc, fp: np.ndarray, max_fs: float) -> tuple[str, set[str]]:
    """G2-G5: y-group, x-merge, join, cleanup (analysis_new.py:156-218)."""
    order = fp[np.lexsort((d.y[fp], -d.size[fp]))]  # (-size, y) stable
    big = [i for i in order if d.size[i] >= max_fs * 0.85]
    groups: dict[float, list[int]] = {}
    for i in big:
        for gy in groups:
            if abs(d.y[i] - gy) <= max(d.size[i] * 0.15, 3):
                groups[gy].append(i)
                break
        else:
            groups[d.y[i]] = [i]
    lines, title_idx = [], []
    for _, grp in sorted(groups.items()):
        grp.sort(key=lambda i: d.x0[i])
        merged = ""
        last_end = -1000.0
        for i in grp:
            t = d.text[i].strip()
            if d.x0[i] < last_end + d.size[i] * 0.2:
                if t in merged or merged.endswith(t[:3]):
                    continue  # skip WITHOUT advancing last_end
                merged += t
            elif merged and not merged.endswith(" "):
                merged += " " + t
            else:
                merged += t
            last_end = d.x1[i]
        if merged.strip():
            lines.append(merged.strip())
            title_idx.extend(grp)
    if not lines:
        return "", set()
    title = re.sub(r"\s+", " ", " ".join(lines))
    title = re.sub(r"([a-z])([A-Z])", r"\1 \2", title)
    words = title.split()
    kept: list[str] = []
    for i, w in enumerate(words):
        if i > 0 and (
            w == words[i - 1]
            or (len(w) > 3 and len(words[i - 1]) > 3 and w.lower() in words[i - 1].lower())
        ):
            continue
        kept.append(w)
    return " ".join(kept), {d.text[i] for i in title_idx}


def _single_page_title(d: _Doc, fp: np.ndarray, max_fs: float) -> tuple[str, set[str]]:
    """G6 (analysis_new.py:219-234). The reference's :227 arm is dead code."""
    order = fp[np.lexsort((d.y[fp], -d.size[fp]))]
    cands = [i for i in order if d.size[i] >= max_fs * 0.8][:3]
    for i in cands:
        if (d.centered[i] or d.size[i] >= max_fs * 0.9) and len(d.text[i].strip()) > 3:
            return d.text[i].strip(), {d.text[i]}
    return "", set()


def _poster_phrases(d: _Doc, cand: list[int], baseline: float) -> list[dict]:
    """G7-G9 poster phrase grouping (analysis_new.py:251-306)."""
    pool = []
    for i in cand:
        t = d.text[i]
        if t.strip().upper() in _FIELD_LABELS:
            continue
        if _CONTACT_RX.search(t.lower()):
            continue
        if len(t) > 50 and d.size[i] < baseline:
            continue
        pool.append(i)
    if not pool:
        return []
    ordered = sorted(pool, key=lambda i: (d.y[i], d.x0[i]))
    used: set[int] = set()
    groups: list[list[int]] = []
    for seed in ordered:
        if seed in used:
            continue
        grp = [seed]
        used.add(seed)
        for other in ordered:
            if other in used:
                continue
            if abs(d.y[other] - d.y[seed]) <= max(d.size[seed] * 0.1, 2):
                gap = min(
                    min(abs(d.x0[other] - d.x1[m]), abs(d.x0[m] - d.x1[other])) for m in grp
                )
                if gap < max(d.size[seed] * 2, 20):
                    grp.append(other)
                    used.add(other)
        if len(grp) > 1:
            grp.sort(key=lambda i: d.x0[i])
            groups.append(grp)
    if not groups:
        return []
    best = max(
        groups,
        key=lambda g: (max(d.size[i] for i in g), sum(len(d.text[i].split()) for i in g)),
    )
    combined = " ".join(d.text[i].strip() for i in best).strip()
    if len(combined) > 5 and not _DIGITS_ONLY_RX.match(combined):
        return [{"level": "H1", "text": combined + " ", "page": 0}]
    return []


def _assign_levels(d: _Doc, cand: list[int], tiers: list[float], title_texts: set[str]) -> list[dict]:
    """G11-G14 multipage outline emission (analysis_new.py:330-395)."""
    level_map: dict[tuple, str] = {}
    for i, ts in enumerate(tiers):
        level_map[(ts, True)] = f"H{i+1}"
        level_map[(ts, False)] = f"H{i+1}"
    clusters: dict[tuple, list[int]] = defaultdict(list)
    for i in cand:
        if d.numbering[i] is not None:
            continue
        key = (round(d.size[i]), bool(d.bold[i]))  # banker's rounding
        matched = False
        for ts in tiers:
            if abs(d.size[i] - ts) < 0.5:
                level_map[key] = level_map.get((ts, bool(d.bold[i])), f"H{len(tiers)+1}")
                matched = True
                break
        if not matched:
            clusters[key].append(i)
    counter = len(tiers) + 1
    for key, _ in sorted(clusters.items(), key=lambda kv: -kv[0][0]):
        if key not in level_map:
            level_map[key] = f"H{min(counter, 6)}"
            counter += 1

    outline = []
    for i in cand:
        t = d.text[i]
        if t in title_texts or d.page[i] == 0:
            continue
        if d.numbering[i] is None and d.case[i] == "Lower" and len(t.strip()) < 10:
            continue
        num = d.numbering[i]
        if num == "x.":
            level = "H1"
        elif num == "x.y.":
            level = "H2"
        elif num == "x.y.z.":
            level = "H3"
        else:
            level = None
            for k, ts in enumerate(tiers):
                if abs(d.size[i] - ts) < 0.5:
                    level = f"H{k+1}"
                    break
            if not level:
                level = level_map.get((round(d.size[i]), bool(d.bold[i])), "H4")
        text = t.strip()
        if not text.endswith(" "):
            text += " "
        outline.append({"level": level, "text": text, "page": int(d.page[i])})

    text_arr = d.text
    y_arr = d.y

    def sort_key(e: dict):
        # literal replication of analysis_new.py:395 (never matches in
        # practice — outline text has a trailing space)
        hits = np.nonzero(text_arr == e["text"])[0]
        return (e["page"], y_arr[hits[0]] if len(hits) else 0)

    outline.sort(key=sort_key)
    return outline


def classify_doc(d: _Doc, baseline: float, tiers: list[float]) -> tuple[str, list[dict]]:
    total_pages = len(set(d.page.tolist()))
    poster_v1 = total_pages == 1
    cand = _candidate_indices(d, baseline, poster_v1)

    fp = np.nonzero(d.page == 0)[0]
    title, title_texts = "", set()
    if len(fp):
        max_fs = d.size[fp].max()
        if total_pages > 1:
            title, title_texts = _multipage_title(d, fp, max_fs)
        else:
            title, title_texts = _single_page_title(d, fp, max_fs)

    has_numbering = any(x is not None for x in d.numbering)
    if total_pages == 1:
        joined = " ".join(t.lower() for t in d.text)
        posterish = sum(1 for k in _POSTER_KEYS if k in joined) >= 2
        formish = sum(1 for k in _FORM_KEYS if k in joined) >= 3
        if (posterish or formish) and not has_numbering:
            return "", _poster_phrases(d, cand, baseline)
        if not title and len(fp):
            largest = fp[int(np.argmax(d.size[fp]))]
            title = d.text[largest].strip()
            title_texts.add(d.text[largest])
        heads = [
            i
            for i in cand
            if d.text[i] not in title_texts
            and (
                (d.case[i] == "UPPER" and len(d.text[i].strip()) > 5)
                or d.size[i] >= baseline * 1.2
            )
        ]
        outline = []
        if heads:
            best = min(heads, key=lambda i: (d.y[i], -d.size[i]))
            outline.append({"level": "H1", "text": d.text[best].strip(), "page": 0})
        return title, outline

    return title, _assign_levels(d, cand, tiers, title_texts)


def analyze_batch(blocks: pd.DataFrame) -> Iterator[tuple[str, str, list[dict]]]:
    """Run the full 3-pass analysis for every document in a batch.

    Yields (url, title, outline). Documents with zero blocks are
    simply absent (the caller decides failed-row semantics, S4).
    """
    if blocks.empty:
        return
    df = featurize(blocks)
    baseline_df, tiers = doc_stats(df)
    scored = score(df, baseline_df, tiers)
    bmap = dict(zip(baseline_df["url"], baseline_df["baseline"]))
    cols = _BatchCols(scored)
    for url, idx in scored.groupby("url", sort=False).indices.items():
        d = _Doc(cols, idx)
        title, outline = classify_doc(d, bmap.get(url, 0.0), tiers.get(url, []))
        yield url, title, outline
