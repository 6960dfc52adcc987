#!/usr/bin/env python
"""End-to-end verification drive: build the shipped artifact, run the
production CLI through spark-submit (the north rule's interface), and
byte-compare every spandoc row of the written table against the ACTUAL
reference extractor at /root/reference (driven through a minimal fake
``fitz`` that serves the same synthetic span documents — the pattern
tests/test_refimpl_vs_reference.py pins).

Run: python tools/verify_drive.py [--n 400] [--seed 11] [--cores 8]
Exit 0 = drive green AND every spandoc row byte-identical (the
reference compare is skipped, with a notice, when /root/reference is
absent). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import shutil
import subprocess
import sys
import tempfile
import types
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

REF = Path("/root/reference")


def _build_and_drive(n: int, seed: int, cores: int, out_dir: str) -> dict:
    zip_path = _REPO / "dist" / "engine.zip"
    zip_path.parent.mkdir(exist_ok=True)
    zip_path.unlink(missing_ok=True)
    subprocess.run(
        ["zip", "-qr", str(zip_path), "pdf_extractor_spark"], cwd=_REPO, check=True
    )
    # the launcher must live OUTSIDE the repo dir, else Python imports
    # the package from CWD instead of the shipped zip
    launcher = Path(tempfile.gettempdir()) / "pdfx_verify_launcher.py"
    shutil.copy(_REPO / "pdf_extractor_spark" / "cli.py", launcher)
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", f"local[{cores}]",
            "--py-files", str(zip_path),
            str(launcher),
            "--synthesize", str(n),
            "--seed", str(seed),
            "--output", out_dir,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def _reference_extractor():
    """Import the ACTUAL reference code with a fake fitz whose open()
    serves spandoc pages (shape adapter: spandoc block=[line=[span]]
    → fitz {'lines': [{'spans': line}]})."""
    registry: dict[str, list[dict]] = {}

    class _FakeRect:
        def __init__(self, w):
            self.width = w

    class _FakePage:
        def __init__(self, page):
            self.rect = _FakeRect(page.get("width", 0.0))
            self._blocks = [
                {"lines": [{"spans": line} for line in block]}
                for block in page.get("blocks", [])
            ]

        def get_text(self, kind):
            assert kind == "dict"
            return {"blocks": self._blocks}

    class _FakeDoc(list):
        def close(self):
            pass

    fake = types.ModuleType("fitz")
    fake.open = lambda path: _FakeDoc(_FakePage(p) for p in registry[path])
    sys.modules["fitz"] = fake
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    spec = importlib.util.spec_from_file_location(
        "ref_extract_outline", REF / "extract_outline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.PDFOutlineExtractor(), registry


def _byte_compare(out_dir: str, n: int, seed: int) -> dict:
    import duckdb

    from pdf_extractor_spark import corpus
    from pdf_extractor_spark.sources import payload as payload_codec

    extractor, registry = _reference_extractor()
    rows = duckdb.sql(
        f"SELECT url, outline_json FROM read_parquet('{out_dir}/result/*/*/*.parquet',"
        " hive_partitioning=1) WHERE ok = 1"
    ).fetchall()
    written = dict(rows)
    n_span = n_match = n_mismatch = 0
    first_bad = None
    for r in corpus.build_pages_rows(n, seed):
        try:
            kind, pages = payload_codec.parse_payload(r["html"])
        except Exception:
            continue
        if kind != "spandoc":
            continue
        n_span += 1
        registry["doc"] = pages
        ref = extractor.process_single_pdf("doc")
        expect = (
            None if ref is None else json.dumps(ref, indent=2, ensure_ascii=False)
        )
        if expect == written.get(r["url"]):
            n_match += 1
        else:
            n_mismatch += 1
            first_bad = first_bad or r["url"]
    return {
        "spandoc_rows": n_span,
        "byte_identical": n_match,
        "mismatch": n_mismatch,
        "first_mismatch_url": first_bad,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    out_dir = tempfile.mkdtemp(prefix="pdfx_verify_drive_")
    try:
        summary = _build_and_drive(args.n, args.seed, args.cores, out_dir)
        # corrupt slice is i % 41 == 7: count of such i in [0, n) —
        # (n+33)//41, NOT ceil(n/41) (ceil overcounts by 1 whenever
        # n mod 41 is in 1..7)
        expect_failures = (args.n + 33) // 41
        ok = (
            summary["rows_in"] == args.n
            and summary["parse_failures"] == expect_failures
        )
        result = {"drive": summary, "drive_totals_ok": ok}
        if REF.exists():
            cmp = _byte_compare(out_dir, args.n, args.seed)
            result["reference_compare"] = cmp
            ok = ok and cmp["mismatch"] == 0 and cmp["byte_identical"] > 0
        else:
            result["reference_compare"] = "skipped: /root/reference absent"
        result["ok"] = ok
        print(json.dumps(result))
        return 0 if ok else 1
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
