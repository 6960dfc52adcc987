"""Corruption-robustness fuzz for the pure-Python PDF parser.

Web-crawled PDFs arrive truncated, byte-flipped, and spliced. The S4
error-swallowing scan (operators/extract.py:88-90) tolerates ANY
exception, but the parser must still be safe to run inside an executor:
no hangs, no unbounded memory, no interpreter-level crashes — every
mutation either parses to a well-formed span list or raises a normal
Exception promptly. PyMuPDF (the reference's parser,
extract_outline.py:19) gives the same guarantee natively; this pins it
for pdfparse.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_extractor_spark import corpus
from pdf_extractor_spark.sources import pdfparse


def _check(payload: bytes) -> None:
    try:
        pages = pdfparse.extract_spans(payload)
    except Exception as exc:  # any *orderly* exception is S4-acceptable
        assert not isinstance(exc, (MemoryError, RecursionError, SystemExit, KeyboardInterrupt))
        return
    # parsed despite corruption: output must still be well-formed
    # (extract_spans pages are {'width','height','blocks'} with blocks
    # = list of lines, each line a list of span dicts)
    assert isinstance(pages, list)
    for page in pages:
        assert isinstance(page["blocks"], list)
        for block in page["blocks"]:
            for line in block:
                for span in line:
                    assert isinstance(span["text"], str)
                    assert isinstance(span["size"], (int, float))
                    assert len(span["bbox"]) == 4


@settings(max_examples=60, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31), cut=st.floats(0.01, 0.99))
def test_truncation_never_crashes(seed, cut):
    pdf = corpus.random_pdf(random.Random(seed))
    _check(pdf[: int(len(pdf) * cut)])


@settings(max_examples=60, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(0, 2**31),
    flips=st.lists(st.tuples(st.integers(0, 2**31), st.integers(0, 255)), min_size=1, max_size=16),
)
def test_byteflips_never_crash(seed, flips):
    pdf = bytearray(corpus.random_pdf(random.Random(seed)))
    for pos, val in flips:
        pdf[pos % len(pdf)] = val
    _check(bytes(pdf))


@settings(max_examples=30, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31), junk=st.binary(min_size=1, max_size=4096))
def test_splice_never_crashes(seed, junk):
    pdf = corpus.random_pdf(random.Random(seed))
    mid = len(pdf) // 2
    _check(pdf[:mid] + junk + pdf[mid:])


@settings(max_examples=30, deadline=10000)
@given(junk=st.binary(max_size=2048))
def test_pure_garbage_raises_cleanly(junk):
    _check(b"%PDF-1.4\n" + junk)
