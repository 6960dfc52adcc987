"""Structured Streaming execution-path tests.

The transformations themselves are oracle-checked in batch mode via
the query registry; here we prove the STREAMING execution works: file
source → watermark → availableNow trigger → (foreachBatch commit |
memory sink), with the batch run of the same plan as the oracle.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

import pytest

from pdf_extractor_spark import corpus
from pdf_extractor_spark import io as pio
from pdf_extractor_spark.schemas import PAGES_SCHEMA
from pdf_extractor_spark.streaming import pipeline as STRM


@pytest.fixture()
def tmpdirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("pages", "out", "ckpt")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def _write_pages(spark, path: str, n: int, seed: int, files: int) -> None:
    rows = corpus.build_pages_rows(n, seed=seed)
    spark.createDataFrame(rows, schema=PAGES_SCHEMA).repartition(files).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_extract_matches_batch(spark, tmpdirs):
    _write_pages(spark, tmpdirs["pages"], 120, seed=5, files=6)

    stream = STRM.stream_pages(spark, tmpdirs["pages"], max_files=2)
    assert stream.isStreaming
    q = STRM.stream_extract(stream, tmpdirs["out"], tmpdirs["ckpt"], n_buckets=8)
    q.awaitTermination(300)

    got = pio.read_result(spark, tmpdirs["out"], include_failed=True)
    from pdf_extractor_spark.operators.extract import extract_pages

    batch = extract_pages(spark.read.parquet(tmpdirs["pages"]), keep_failed=True)
    g = {r["url"]: r["outline_json"] for r in got.collect()}
    b = {r["url"]: r["outline_json"] for r in batch.collect()}
    assert g == b  # every url, byte-identical JSON, no dupes/misses

    # lineage manifest accumulated across micro-batches
    import json

    manifest = json.loads((Path(tmpdirs["out"]) / "_lineage" / "manifest.json").read_text())
    assert manifest["totals"]["rows_in"] == 120


def test_stream_extract_is_restartable(spark, tmpdirs):
    """Checkpoint + cumulative lineage: new files after a restart are
    processed exactly once."""
    _write_pages(spark, tmpdirs["pages"] + "/a", 40, seed=7, files=2)
    # file source watches a directory; write both rounds into it
    import os

    os.makedirs(tmpdirs["pages"], exist_ok=True)
    for f in Path(tmpdirs["pages"] + "/a").glob("*.parquet"):
        f.rename(Path(tmpdirs["pages"]) / f.name)

    stream = STRM.stream_pages(spark, tmpdirs["pages"])
    STRM.stream_extract(stream, tmpdirs["out"], tmpdirs["ckpt"], n_buckets=8).awaitTermination(300)

    _write_pages(spark, tmpdirs["pages"] + "/b", 80, seed=7, files=2)
    seen = {f.name for f in Path(tmpdirs["pages"]).glob("*.parquet")}
    for f in Path(tmpdirs["pages"] + "/b").glob("*.parquet"):
        f.rename(Path(tmpdirs["pages"]) / f"r2_{f.name}")

    stream2 = STRM.stream_pages(spark, tmpdirs["pages"])
    STRM.stream_extract(stream2, tmpdirs["out"], tmpdirs["ckpt"], n_buckets=8).awaitTermination(300)

    got = pio.read_result(spark, tmpdirs["out"], include_failed=True).collect()
    urls = [r["url"] for r in got]
    assert len(urls) == len(set(urls))
    # seed-7 corpora are prefixes of each other: 40-doc round ⊂ 80-doc round,
    # so distinct urls after both rounds = 80
    assert len(set(urls)) == 80


def test_stream_extract_resumes_after_first_offset_commit_crash(spark, tmpdirs):
    """A kill between the offset log's temp write and its rename leaves
    ``.0.<uuid>.tmp`` in ckpt/offsets with NO committed batch; Spark 4
    then classifies the restart as a NEW query and fails it with
    STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY — permanently, until
    someone hand-deletes the temp (fuzz_sweep --stream-warc seed
    987654, trial 13). stream_extract must self-heal that state."""
    import os

    _write_pages(spark, tmpdirs["pages"], 60, seed=11, files=3)

    # construct the crash debris exactly as HDFSMetadataLog leaves it
    offsets = Path(tmpdirs["ckpt"]) / "offsets"
    offsets.mkdir(parents=True)
    tmp = offsets / f".0.{uuid.uuid4()}.tmp"
    tmp.touch()
    # the batch-0 metadata file exists (written before the offset log)
    (Path(tmpdirs["ckpt"]) / "metadata").write_text('{"id":"' + str(uuid.uuid4()) + '"}')

    stream = STRM.stream_pages(spark, tmpdirs["pages"], max_files=2)
    q = STRM.stream_extract(stream, tmpdirs["out"], tmpdirs["ckpt"], n_buckets=8)
    q.awaitTermination(300)
    assert not tmp.exists()  # debris removed, not worked around

    got = pio.read_result(spark, tmpdirs["out"], include_failed=True).collect()
    urls = [r["url"] for r in got]
    assert len(urls) == len(set(urls)) == 60  # drained, exactly once

    # committed metadata-log entries must survive sanitation: rerun over
    # the same checkpoint with a real offsets/0 present is a no-op
    from pdf_extractor_spark.streaming.pipeline import sanitize_checkpoint

    committed = {p.name for p in offsets.iterdir() if not p.name.startswith(".")}
    assert committed  # the drained run committed at least batch 0
    assert sanitize_checkpoint(spark, tmpdirs["ckpt"]) == 0
    assert {p.name for p in offsets.iterdir() if not p.name.startswith(".")} == committed
    assert os.path.isdir(tmpdirs["ckpt"])


def test_streaming_aggregations_run_with_watermark(spark, tmp_path):
    """windowed + session aggregations execute on a real stream (memory
    sink, availableNow) and agree with their batch twins."""
    ev_dir = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.repartition(4).write.mode("overwrite").parquet(ev_dir)

    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 2).parquet(ev_dir)
    )
    for fn, name in (
        (STRM.windowed_event_counts, f"win_{uuid.uuid4().hex[:8]}"),
        (STRM.session_windows, f"sess_{uuid.uuid4().hex[:8]}"),
    ):
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {tuple(r) for r in spark.table(name).collect()}
        want = {tuple(r) for r in fn(events).collect()}
        assert got == want


def test_size_aware_repartition_bounds_partition_bytes(spark):
    """A few giant payloads must not co-locate with a full partition
    of normal docs (north rule: size-aware repartitioning)."""
    import pyspark.sql.functions as F

    normal = spark.range(400).select(
        F.concat(F.lit("https://h/n"), F.col("id")).alias("url"),
        F.expr("cast(repeat('x', 2048) as binary)").alias("html"),
    )
    giant = spark.range(3).select(
        F.concat(F.lit("https://h/g"), F.col("id")).alias("url"),
        F.expr("cast(repeat('y', 1048576) as binary)").alias("html"),
    )
    pages = normal.unionByName(giant)
    out = pio.size_aware_repartition(
        pages, target_partition_bytes=1 << 20, big_threshold=64 << 10
    )
    sizes = (
        out.select(F.spark_partition_id().alias("p"), F.length("html").alias("b"))
        .groupBy("p")
        .agg(F.sum("b").alias("bytes"), F.count("*").alias("rows"), F.max("b").alias("max_b"))
        .collect()
    )
    # no partition exceeds target + one max doc...
    for r in sizes:
        assert r["bytes"] <= (1 << 20) + (1 << 20), r
    # ...and partitions holding giants hold ONLY giants (no mixing
    # with the 400-doc small pool)
    giant_parts = [r for r in sizes if r["max_b"] > 64 << 10]
    assert giant_parts and all(r["rows"] <= 3 for r in giant_parts)


def test_stateful_user_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState: per-user state accumulated across
    micro-batches; the last emitted row per user must equal the plain
    batch aggregate."""
    import pyspark.sql.functions as F

    ev_dir = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.repartition(5).write.mode("overwrite").parquet(ev_dir)

    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 2).parquet(ev_dir)
    )
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        STRM.stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update mode appends one row per user per micro-batch that touched
    # it; the LAST row per user is the final state
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table(name).collect()  # memory sink preserves batch order
    }
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("t"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_drops_recrawls(spark, tmp_path):
    """dropDuplicatesWithinWatermark on url: a corpus written twice
    (re-crawl) streams through to exactly one row per url."""
    import pandas as pd

    from pdf_extractor_spark import corpus

    pages_dir = str(tmp_path / "pages")
    rows = corpus.build_pages_rows(40, seed=21)
    df = spark.createDataFrame(pd.DataFrame(rows))
    df.write.mode("overwrite").parquet(pages_dir)
    df.write.mode("append").parquet(pages_dir)  # duplicate crawl

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(pages_dir)
    )
    # watermark must exceed the corpus' event-time span (40 docs × 37 s
    # ≈ 25 min): files arrive in arbitrary order, so a short horizon
    # would DROP late first-appearances as late data, not dedup them
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        STRM.streaming_dedup(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).select("url").collect()
    urls = [r.url for r in got]
    assert len(urls) == len(set(urls)) == 40
