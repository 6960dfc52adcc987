"""Corruption fuzz for the HTML boilerplate extractor.

Crawled HTML is the dirtiest input class the pipeline has: truncated
responses, binary spliced into markup, unclosed/mismatched tags. The
round-3 open-element-stack rewrite (operators/html_extract.py) must
hold the same contract the PDF parser fuzz pins: any byte string either
extracts to a well-formed result dict or raises an orderly Exception —
no hangs, no interpreter-level crashes, and drop/link depth state can
never go negative or leak past the document end.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.operators.html_extract import extract_html

_TAGS = [
    "p", "div", "a", "h1", "h2", "h3", "nav", "aside", "footer", "header",
    "script", "style", "ul", "li", "option", "select", "br", "img", "table",
]
_WORDS = "the quick brown fox data spark shuffle partition vector column".split()


def _tag_soup(seed: int) -> bytes:
    rng = random.Random(seed)
    parts = ["<html><body>"]
    for _ in range(rng.randint(5, 60)):
        roll = rng.random()
        tag = rng.choice(_TAGS)
        if roll < 0.35:
            parts.append(f"<{tag}>")  # often never closed
        elif roll < 0.55:
            parts.append(f"</{tag}>")  # often never opened
        elif roll < 0.7:
            parts.append(f"<{tag} href='/x' class=\"{rng.choice(_WORDS)}\">")
        else:
            parts.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 12))))
    if rng.random() < 0.5:
        parts.append("</body></html>")
    return "".join(parts).encode()


def _check(payload: bytes) -> None:
    try:
        res = extract_html(payload)
    except Exception as exc:  # orderly exceptions are S4-acceptable
        assert not isinstance(
            exc, (MemoryError, RecursionError, SystemExit, KeyboardInterrupt)
        )
        return
    assert set(res) == {"title", "main_text", "outline", "n_kept", "n_dropped"}
    assert isinstance(res["main_text"], str)
    assert res["n_kept"] >= 0 and res["n_dropped"] >= 0
    for e in res["outline"]:
        assert set(e) == {"level", "text", "page"}
        assert e["level"] in {"H1", "H2", "H3", "H4", "H5", "H6"}


@settings(max_examples=80, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31))
def test_tag_soup_never_crashes(seed):
    _check(_tag_soup(seed))


@settings(max_examples=60, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31), cut=st.floats(0.01, 0.99))
def test_truncated_soup_never_crashes(seed, cut):
    doc = _tag_soup(seed)
    _check(doc[: int(len(doc) * cut)])


@settings(max_examples=60, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(junk=st.binary(max_size=4096))
def test_binary_junk_never_crashes(junk):
    _check(junk)


@settings(max_examples=40, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31), junk=st.binary(min_size=1, max_size=512))
def test_binary_splice_never_crashes(seed, junk):
    doc = _tag_soup(seed)
    rng = random.Random(seed)
    pos = rng.randrange(len(doc) + 1)
    _check(doc[:pos] + junk + doc[pos:])
