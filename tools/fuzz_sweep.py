#!/usr/bin/env python
"""Extended corruption sweep across every untrusted-input surface.

The pytest fuzz suites (tests/test_pdfparse_fuzz.py, test_pdfcrypt_fuzz.py,
test_html_fuzz.py, test_pdfparse.py::test_fuzzed_pdfs_never_hang) pin the
orderly-failure contract on a bounded per-run example budget so the suite
stays fast. This tool runs the SAME contracts at arbitrary scale — tens of
thousands of mutated documents across an mp.Pool — as a pre-judge
robustness soak. Web-crawled corpora at 100 TB hit every corruption class
daily; one interpreter-level crash or pathological loop inside an executor
poisons a whole task retry budget, so the bar is: every byte string either
parses to a well-formed result or raises an orderly Exception promptly.

Run: python tools/fuzz_sweep.py [--iters 20000] [--seed 0] [--workers 16]
Exit 0 = contract held on every mutant; nonzero = violation (printed).
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from collections import Counter
from multiprocessing import Pool
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

from pdf_extractor_spark import corpus  # noqa: E402
from pdf_extractor_spark.operators.html_extract import extract_html  # noqa: E402
from pdf_extractor_spark.sources import payload as payload_mod  # noqa: E402
from pdf_extractor_spark.sources import pdfparse  # noqa: E402
from pdf_extractor_spark.sources import warc as warc_mod  # noqa: E402

_DISORDERLY = (MemoryError, RecursionError, SystemExit, KeyboardInterrupt)
_BUDGET_SEC = 10.0  # same per-doc wall budget the pytest fuzzers use

_SEEDS: dict[str, list[bytes]] = {}


def _build_seeds() -> dict[str, list[bytes]]:
    """Deterministic seed corpus covering every decode path: generated
    PDFs, the reference fixture PDFs, Type3 + embedded-CMap fonts,
    RC4/AES encrypted docs, spandoc payloads, and tag-soup HTML."""
    pdfs = [corpus.random_pdf(random.Random(s)) for s in range(6)]
    fixtures = _REPO / "tests" / "fixtures" / "pdfs"
    for p in sorted(fixtures.glob("*.pdf")) if fixtures.exists() else []:
        pdfs.append(p.read_bytes())
    ref_fix = Path("/root/reference/input")
    for p in sorted(ref_fix.glob("*.pdf")) if ref_fix.exists() else []:
        pdfs.append(p.read_bytes())
    import test_pdf_fonts as tpf  # construction-truth exotic-font builders

    pdfs.append(tpf._build(tpf._t3_font(), b"BT /F1 24 Tf 72 700 Td (ABC) Tj ET", 5))
    cm = (
        b"begincmap\n"
        b"2 begincodespacerange <00> <7F> <8140> <FEFE> endcodespacerange\n"
        b"1 begincidrange <41> <43> 100 endcidrange\n"
        b"1 begincidchar <8140> 500 endcidchar\nendcmap"
    )
    tu = b"begincmap\n1 beginbfrange <41> <43> <0058> endbfrange\nendcmap"
    pdfs.append(
        tpf._build(
            tpf._type0(cm, tu, b"[100 [250 250 250]]"),
            b"BT /F1 24 Tf 72 700 Td (AB\x81\x40C) Tj ET",
            8,
        )
    )
    import test_pdfcrypt_fuzz as tcf  # rc4/aes encrypted fixtures

    crypt = [tcf._FIXTURES["rc4"], tcf._FIXTURES["aes"]]
    spandocs = [
        corpus.spandoc_to_payload(corpus.random_spandoc(random.Random(s)))
        for s in range(4)
    ]
    htmls = [corpus.random_html(random.Random(s)) for s in range(6)]
    warcs = []
    for s, gz in ((0, False), (1, True)):
        rows = corpus.build_pages_rows(8, seed=100 + s)
        warcs.append(corpus.rows_to_warc(rows, member_gzip=gz))
    return {
        "pdf": pdfs,
        "crypt": crypt,
        "spandoc": spandocs,
        "html": htmls,
        "warc": warcs,
    }


def _mutate(rng: random.Random, doc: bytes) -> bytes:
    op = rng.randrange(4)
    if op == 0:  # truncate
        return doc[: rng.randrange(1, max(2, len(doc)))]
    if op == 1:  # bit flips
        b = bytearray(doc)
        for _ in range(rng.randrange(1, 30)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        return bytes(b)
    if op == 2:  # binary splice
        junk = bytes(rng.getrandbits(8) for _ in range(rng.randrange(1, 2048)))
        pos = rng.randrange(len(doc) + 1)
        return doc[:pos] + junk + doc[pos:]
    # header + pure garbage
    junk = bytes(rng.getrandbits(8) for _ in range(rng.randrange(0, 2048)))
    return doc[: rng.randrange(0, min(16, len(doc)))] + junk


def _assert_pages(pages) -> None:
    assert isinstance(pages, list)
    for page in pages:
        for block in page["blocks"]:
            for line in block:
                for span in line:
                    assert isinstance(span["text"], str)
                    assert isinstance(span["size"], (int, float))
                    assert len(span["bbox"]) == 4


def _assert_html(res) -> None:
    assert set(res) == {"title", "main_text", "outline", "n_kept", "n_dropped"}
    assert isinstance(res["main_text"], str)
    assert res["n_kept"] >= 0 and res["n_dropped"] >= 0
    for e in res["outline"]:
        assert e["level"] in {"H1", "H2", "H3", "H4", "H5", "H6"}


def _one(task: tuple[int, int]) -> dict:
    """One mutant: returns outcome metadata; raises on contract breach."""
    global _SEEDS
    if not _SEEDS:
        _SEEDS = _build_seeds()
    i, base_seed = task
    rng = random.Random(base_seed * 1_000_003 + i)
    kind = rng.choice(("pdf", "pdf", "crypt", "spandoc", "html", "html", "warc"))
    doc = _mutate(rng, rng.choice(_SEEDS[kind]))
    t0 = time.monotonic()
    err = None
    try:
        if kind == "html":
            _assert_html(extract_html(doc))
        elif kind == "warc":
            # bounded iteration: the record generator must terminate on
            # ANY byte string (a backward scan = infinite loop = hang)
            n_rec = 0
            for headers, block in warc_mod.iter_warc_records(doc):
                assert isinstance(headers, dict)
                warc_mod.http_response_body(block)
                n_rec += 1
                assert n_rec <= 10_000, "runaway record generator"
        elif kind == "spandoc":
            k, pages = payload_mod.parse_payload(doc)
            if pages is not None:
                _assert_pages(pages)
        else:
            _assert_pages(pdfparse.extract_spans(doc))
        outcome = "parsed"
    except Exception as exc:
        if isinstance(exc, _DISORDERLY) or isinstance(exc, AssertionError):
            raise  # contract breach — surface with the failing (i, seed)
        outcome = "raised"
        err = type(exc).__name__
    elapsed = time.monotonic() - t0
    if elapsed > _BUDGET_SEC:
        raise RuntimeError(f"wall budget breach: {kind} mutant {i} took {elapsed:.1f}s")
    return {"kind": kind, "outcome": outcome, "err": err, "sec": elapsed}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=16)
    args = ap.parse_args()

    tasks = [(i, args.seed) for i in range(args.iters)]
    t0 = time.monotonic()
    by_kind: Counter = Counter()
    outcomes: Counter = Counter()
    errs: Counter = Counter()
    max_sec = 0.0
    with Pool(args.workers) as pool:
        for res in pool.imap_unordered(_one, tasks, chunksize=256):
            by_kind[res["kind"]] += 1
            outcomes[f"{res['kind']}:{res['outcome']}"] += 1
            if res["err"]:
                errs[res["err"]] += 1
            max_sec = max(max_sec, res["sec"])
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "iters": args.iters,
                "seed": args.seed,
                "wall_sec": round(wall, 1),
                "mutants_per_sec": round(args.iters / wall, 1),
                "by_kind": dict(by_kind),
                "outcomes": dict(outcomes),
                "orderly_exception_classes": dict(errs),
                "max_single_doc_sec": round(max_sec, 3),
                "contract": "held",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
