"""bench.py orchestration invariants (no TPU, no phase execution): the
phase table, budget estimates, and merged-JSON assembly must stay
consistent — a missing estimate or a detail-field typo would silently
drop a family's headline from the official artifact (VERDICT r04 #1)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_every_phase_has_budget_estimates():
    assert set(bench.WORST_COLD) == set(bench.PHASES)
    assert set(bench.WORST_WARM) == set(bench.PHASES)
    for name in bench.PHASES:
        assert bench.WORST_WARM[name] <= bench.WORST_COLD[name]


def test_detail_fields_reference_real_phases():
    for out_key, phase, raw_key, nd in bench.DETAIL_FIELDS:
        assert phase in bench.PHASES, out_key


def test_family_headlines_before_redundant_variants():
    order = list(bench.PHASES)
    # each family's first (headline) phase must precede every redundant
    # uPIT variant — an early budget stop then costs variants, not families
    for headline in ("convtasnet", "sepformer", "dprnn", "rsh", "dsp",
                     "serving"):
        assert order.index(headline) < order.index("upit_f32")
        assert order.index(headline) < order.index("upit_b128")
    assert order[0] == "upit_bf16"


def test_merged_line_with_skips_and_stats():
    results = {"upit_bf16": {"utts_per_sec": 2500.0, "step_ms": 40.0,
                             "compile_s": 1.2, "device": "TPU v5 lite0"},
               "serving": {"utts_per_sec": 60.0, "p50_ms": 120.0,
                           "p99_ms": 400.0, "server_utts_per_sec": 55.0}}
    failures = {"tcn": "skipped: 90s left < 260s worst-case (cold cache)"}
    stats = {"upit_bf16": {"wall_s": 50.0, "compile_s": 1.2}}
    line = bench.merged_line(results, failures, 1.86, 0.4, stats)
    d = json.loads(line)
    assert d["value"] == 2500.0
    assert d["unit"] == "utts/sec/chip"
    assert d["detail"]["serving_p50_ms"] == 120.0
    assert d["detail"]["serving_p99_ms"] == 400.0
    assert d["detail"]["serving_concurrent_utts_per_sec"] == 55.0
    assert d["detail"]["phases"]["upit_bf16"]["compile_s"] == 1.2
    assert "tcn" in d["detail"]["failed_phases"]
    assert d["detail"]["device"] == "TPU v5 lite0"


def test_merged_line_headline_missing_is_flagged():
    d = json.loads(bench.merged_line({}, {"upit_bf16": "timed out"}, 1.86,
                                     float("inf")))
    assert d["value"] == 0
    assert "error" in d["detail"]
    assert d["vs_baseline"] is None


def test_retry_candidates_exclude_budget_skips():
    failures = {
        "dprnn": "rc=1: jax.errors.JaxRuntimeError: FAILED_PRECONDITION",
        "upit_f32": "timed out after 900s",
        "tcn": "skipped: 90s left < 780s worst-case (cold cache)",
    }
    assert bench.retry_candidates(failures) == ["dprnn", "upit_f32"]
    assert bench.retry_candidates({}) == []
