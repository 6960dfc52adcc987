"""Pin the judge-facing BENCH/BASELINE.md writer and the ceiling
estimator contract in bench.py.

The normalization ceiling must use the cross-epoch quiet-state
construction (per-phase throughput maxima, then ratio) — NOT the
max-accumulated per-session ratio, which is storm-biased upward (a
co-tenant storm that slows the probe's 8-proc phase inflates
hi/(4*lo), so its max selects storm-biased draws).  No Spark needed.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_bench(tmp_path):
    # load a copy under a throwaway name with _REPO pointed at tmp_path
    # so _write_scaling_md writes into the sandbox, not BENCH/
    spec = importlib.util.spec_from_file_location("bench_md_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_md_test"] = mod
    spec.loader.exec_module(mod)
    mod._REPO = tmp_path
    return mod


def _out(**over):
    run = {
        "elapsed_sec": 43.3,
        "docs_per_sec": 11085.5,
        "payload_mb_per_sec": 18.61,
        "compute_stage_sec": 43.16,
        "compute_docs_per_sec": 11121.4,
        "rows_out": 468292,
        "parse_failures": 11708,
    }
    base = {
        "local8": run,
        "local32": dict(run, elapsed_sec=17.47),
        "scaling_efficiency_raw": 0.62,
        "host_ceiling_8_to_32": 0.756,
        "scaling_efficiency_normalized": 0.82,
        "compute_stage_efficiency_raw": 0.711,
        "compute_stage_efficiency_normalized": 0.94,
        "n_docs": 480000,
        "seed": 42,
        "rounds": 140,
        "best_invocation": {"t8": 68.8, "t32": 21.44, "eff": 0.802, "ceiling": 0.828},
        "ceiling_probe_log": [0.633, 0.768, {"ratio": 0.756, "lo": 8693.3, "hi": 26295.6}],
        "target": 0.8,
    }
    base.update(over)
    return base


def test_md_writer_handles_mixed_probe_log(tmp_path):
    bench = _load_bench(tmp_path)
    bench._write_scaling_md(_out())
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    # mixed float/dict log entries render without error, span is over ratios
    assert "0.633" in md and "0.768" in md
    assert "Denominator = cross-epoch quiet-state estimator" in md
    # all three verdict rows present
    assert md.count("PASS") + md.count("FAIL") >= 3


def test_md_writer_verdicts_follow_threshold(tmp_path):
    bench = _load_bench(tmp_path)
    bench._write_scaling_md(
        _out(
            scaling_efficiency_raw=0.5,
            scaling_efficiency_normalized=0.6,
            compute_stage_efficiency_raw=0.9,
            compute_stage_efficiency_normalized=1.0,
        )
    )
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    e2e_row = next(l for l in md.splitlines() if l.startswith("| end-to-end job"))
    comp_row = next(l for l in md.splitlines() if l.startswith("| extraction compute"))
    assert "FAIL" in e2e_row
    assert "PASS" in comp_row


def test_md_writer_empty_probe_log(tmp_path):
    bench = _load_bench(tmp_path)
    bench._write_scaling_md(_out(ceiling_probe_log=[]))
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "No v2 probe session recorded" in md


def test_best_credible_pair_excludes_storm_draws(tmp_path):
    """The headline best-pair must come from draws whose low level ran
    near its floor: a storm that slows t8 3x while t32 runs clean reads
    eff > 1, which is a co-tenant artifact, not a scaling observation."""
    bench = _load_bench(tmp_path)
    inv = [
        {"t8": 47.29, "t32": 16.58, "eff": 0.713, "ceiling": None},
        # storm draw: eff 1.077 but its t8 ran 3.15x the floor
        {"t8": 136.42, "t32": 31.66, "eff": 1.077, "ceiling": None},
        {"t8": 55.21, "t32": 25.4, "eff": 0.543, "ceiling": None},
    ]
    best = bench._best_credible_pair(inv, floor_low=43.3, klo="t8")
    assert best["eff"] == 0.713
    assert best["credible"] is True
    # when NO draw is credible the unfiltered max still renders but is
    # FLAGGED — the md writer must render its verdict as indeterminate,
    # never PASS (ADVICE r4: early accumulation let the storm artifact
    # the filter targets headline as a PASS row)
    only_storms = [{"t8": 136.42, "t32": 31.66, "eff": 1.077, "ceiling": None}]
    fb = bench._best_credible_pair(only_storms, 43.3, "t8")
    assert fb["eff"] == 1.077
    assert fb["credible"] is False
    assert bench._best_credible_pair([], 43.3, "t8") is None


def test_md_writer_never_passes_noncredible_pair(tmp_path):
    """A fallback (credible=False) best pair must render an
    indeterminate verdict in BASELINE.md, not PASS — even when its eff
    clears 0.8 (that is exactly the storm artifact)."""
    bench = _load_bench(tmp_path)
    bench._write_scaling_md(
        _out(
            best_invocation={
                "t8": 136.42, "t32": 31.66, "eff": 1.077,
                "ceiling": None, "credible": False,
            }
        )
    )
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "no credible pair yet" in md
    # the credible pair row from _out() default must still PASS
    bench._write_scaling_md(
        _out(
            best_invocation={
                "t8": 68.8, "t32": 21.44, "eff": 0.802,
                "ceiling": 0.828, "credible": True,
            }
        )
    )
    md2 = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "no credible pair yet" not in md2


def test_md_writer_quiet_pair_consistency_check(tmp_path):
    """The same-invocation section must report the quiet-pair
    distribution as the estimate and demote best-pair-by-eff to an
    upper bound (round-3 finding: max-selection picks storm-asymmetric
    draws whose t8 ran far above floor)."""
    bench = _load_bench(tmp_path)
    bench._write_scaling_md(
        _out(
            n_invocations=98,
            quiet_pair_effs=[0.562, 0.594, 0.607, 0.645, 0.689],
            best_pair_tlow_vs_floor=1.59,
        )
    )
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "Same-invocation consistency check" in md
    assert "UPPER BOUND" in md
    assert "0.562–0.689" in md
    assert "1.59×" in md
    # without pair data the section degrades silently, not crashes
    bench._write_scaling_md(_out())
    md2 = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "Same-invocation consistency check" not in md2


def test_phase_estimator_rejects_storm_ratio():
    """The quiet-state construction: a storm session with an inflated
    RATIO but deflated per-phase throughputs must not raise the
    ceiling the way max-of-ratio accumulation did."""
    quiet = {"ratio": 0.756, "lo": 8693.3, "hi": 26295.6}
    storm = {"ratio": 0.844, "lo": 5000.0, "hi": 16880.0}  # both phases slower
    lo = max(quiet["lo"], storm["lo"])
    hi = max(quiet["hi"], storm["hi"])
    consistent = hi / (4 * lo)
    assert abs(consistent - quiet["ratio"]) < 1e-3  # quiet phases win
    assert consistent < max(quiet["ratio"], storm["ratio"])  # not storm-dragged


def _small_out():
    run = {
        "elapsed_sec": 160.0,
        "docs_per_sec": 3000.0,
        "payload_mb_per_sec": 5.0,
        "compute_stage_sec": 155.0,
        "compute_docs_per_sec": 3096.8,
        "rows_out": 468292,
        "parse_failures": 11708,
    }
    return {
        "n_low": 2,
        "n_high": 8,
        "local2": run,
        "local8": dict(run, elapsed_sec=47.0, compute_stage_sec=42.0),
        "scaling_efficiency_raw": 0.851,
        "compute_stage_efficiency_raw": 0.923,
        "host_ceiling_2_to_8": 0.93,
        "scaling_efficiency_normalized": 0.915,
        "compute_stage_efficiency_normalized": 0.992,
        "n_docs": 480000,
        "seed": 42,
        "rounds": 3,
        "n_invocations": 3,
        "quiet_pair_effs": [0.81, 0.85],
        "best_invocation": {"t2": 160.0, "t8": 47.0, "eff": 0.851, "ceiling": 0.93},
        "independent_ceiling_xcheck": {
            "numpy_matmul": {"ratio": 0.95, "sessions": 2},
            "zlib_cpu_control": {"ratio": 0.97, "sessions": 2},
        },
        "target": 0.8,
    }


def test_small_pair_md_writer(tmp_path):
    """The non-default N→4N pair gets its own evidence file whose
    verdict column reads the RAW number against 0.8 (the whole point
    of the unsaturated pair), and the main BASELINE.md writer links
    to it when present."""
    bench = _load_bench(tmp_path)
    (tmp_path / "BENCH").mkdir()
    bench._write_small_pair_md(_small_out())
    md = (tmp_path / "BENCH" / "SCALING_2_8.md").read_text()
    assert "local[2] vs local[8]" in md
    assert "| end-to-end job | 0.851 | 0.93 | 0.915 | PASS |" in md
    assert "SPARK_GRAFT_SCALING_PAIR=2,8" in md
    # raw verdict threshold: below 0.8 raw must read FAIL even if
    # the normalized column clears it
    bench._write_small_pair_md(
        dict(_small_out(), scaling_efficiency_raw=0.7, scaling_efficiency_normalized=0.9)
    )
    md_fail = (tmp_path / "BENCH" / "SCALING_2_8.md").read_text()
    assert "| end-to-end job | 0.7 | 0.93 | 0.9 | FAIL |" in md_fail
    # and the default writer cross-references the small-pair file,
    # rendering the RAW verdict from the accumulated per-pair floors
    # (scaling_state_2_8.json — written by the same --scaling invocation)
    state = {
        "best_runs": {
            "2": {"elapsed_sec": 203.24},
            "8": {"elapsed_sec": 53.67},
        },
        "invocations": [{} for _ in range(8)],
    }
    (tmp_path / "BENCH" / "scaling_state_2_8.json").write_text(json.dumps(state))
    bench._write_scaling_md(_out())
    base = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "BENCH/SCALING_2_8.md" in base
    # 203.24 / (4 * 53.67) = 0.947 → raw PASS line from the floors
    assert "local[2] vs local[8]: **raw e2e 0.947 PASS**" in base
    assert "8 invocations" in base
    # a floor pair below the gate must read FAIL on the raw number
    state["best_runs"]["8"]["elapsed_sec"] = 80.0
    (tmp_path / "BENCH" / "scaling_state_2_8.json").write_text(json.dumps(state))
    bench._write_scaling_md(_out())
    base_fail = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "raw e2e 0.635 FAIL" in base_fail
