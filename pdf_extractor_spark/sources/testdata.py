"""Adapters turning the shared testdata ``documents`` table into
``pages`` rows with deterministic payloads, so the full extraction
pipeline can run over driver-provided parquet (no external data).

Runs distributed (mapInPandas over the documents scan) — the payload
synthesis is itself the stand-in for reading WARC/PDF bytes at scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import corpus


def _spandoc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            corpus.spandoc_to_payload(corpus.spandoc_from_doc_row(int(d), t or ""))
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        yield pd.DataFrame(
            {
                "url": [f"https://testdata.local/doc/{int(d):08d}" for d in pdf["doc_id"]],
                "html": payloads,
                "text": pdf["text"],
                "lang": pdf["lang"],
            }
        )


def _html_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            html_from_doc_row(int(d), t or "") for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        yield pd.DataFrame(
            {
                "url": [f"https://testdata.local/page/{int(d):08d}" for d in pdf["doc_id"]],
                "html": payloads,
                "text": pdf["text"],
                "lang": pdf["lang"],
            }
        )


def html_from_doc_row(doc_id: int, text: str) -> bytes:
    """Deterministic boilerplate-heavy HTML page from a documents row."""
    words = (text or "empty").split()
    title = " ".join(words[:4]).title()
    paras = []
    for k in range(0, len(words), 20):
        chunk = " ".join(words[k : k + 20])
        if k and (doc_id + k) % 60 == 0:
            lvl = 1 + (doc_id + k) % 3
            paras.append(f"<h{lvl}>Section {k // 20}</h{lvl}>")
        paras.append(f"<p>{chunk} and the rest of it is here.</p>")
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in words[:5])
    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f"<script>track({doc_id});</script></head>"
        f"<body><header><nav><ul>{nav}</ul></nav></header>"
        f"<main><article>{''.join(paras)}</article></main>"
        f"<footer><p>© testdata.local <a href='/terms'>terms</a></p></footer>"
        f"</body></html>"
    )
    return html.encode("utf-8")


_PAGES_OUT = "url string, html binary, text string, lang string"


def pages_from_documents(docs: DataFrame, kind: str = "spandoc") -> DataFrame:
    """documents(doc_id, text, lang, ...) → pages rows with payloads.

    The scan is fanned out on doc_id-hash BEFORE the heavy payload +
    extraction stages: a small parquet file arrives as 1 split, which
    would serialize the whole compute pipeline.  At 100 TB the scan is
    naturally parallel and the repartition is skipped (partitions >=
    cluster parallelism), so this costs nothing at scale while making
    local scaling honest.  north_rule: explicit url-hash partitioning.
    """
    fn = _spandoc_batches if kind == "spandoc" else _html_batches
    slim = docs.select("doc_id", "text", "lang")
    sc = docs.sparkSession.sparkContext
    target = sc.defaultParallelism
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target, F.xxhash64("doc_id"))
    return (
        slim.mapInPandas(fn, schema=_PAGES_OUT)
        .withColumn("warc_ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
        .select("url", "warc_ts", "html", "text", "lang")
    )
