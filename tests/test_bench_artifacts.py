"""Bench artifact machinery (bench.py): the BASELINE.md regeneration and
best-committed-sweep selection burned three rounds of scaling evidence to
window noise before round 5 — pin their contracts (pure python, no
Spark)."""

from __future__ import annotations

import json

import bench


def _patch_repo(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "REPO", tmp_path)
    (tmp_path / "BENCH").mkdir()


BASELINE_TEMPLATE = """# BENCH/BASELINE.md

intro text with a | tricky | 99 | table-ish line

## scaling

| pair | eff |
|---|---|
| 4→16 | 0.8 |

| query | seconds |
|---|---|
| q_fast | 1.5 |
| q_slow | 3.0 |

trailing section that must survive
"""


def test_merge_query_minima_is_tail_scoped_and_preserves_trailing(
    monkeypatch, tmp_path
):
    _patch_repo(monkeypatch, tmp_path)
    p = tmp_path / "BENCH" / "BASELINE.md"
    p.write_text(BASELINE_TEMPLATE)
    bench.merge_query_minima({"q_fast": 2.0, "q_slow": 2.5, "q_new": 0.7})
    text = p.read_text()
    # minima: existing rows take min(old, new); new rows append
    assert "| q_fast | 1.5 |" in text
    assert "| q_slow | 2.5 |" in text
    assert "| q_new | 0.7 |" in text
    # rows OUTSIDE the query table are untouched (ADVICE r4: the old
    # regex grabbed any two-column numeric row anywhere in the file)
    assert "| tricky | 99 |" in text
    assert "| 4→16 | 0.8 |" in text
    # content after the query table survives the rewrite
    assert "trailing section that must survive" in text


def _sweep(primary_eff: float) -> dict:
    return {
        "events": 1000,
        "trials": {"4": 2, "16": 2},
        "configs": {
            "4": {"cores": 4, "trials": 2, "seconds": 40.0,
                  "events_per_sec": 25.0},
            "16": {"cores": 16, "trials": 2,
                   "seconds": 40.0 / (4 * primary_eff),
                   "events_per_sec": 25.0 * 4 * primary_eff},
        },
        "pairs": [
            {"n": 4, "4n": 16, "primary": True, "speedup": 4 * primary_eff,
             "efficiency": primary_eff, "cpu_ceiling": 0.9,
             "efficiency_vs_ceiling": round(primary_eff / 0.9, 3)},
        ],
    }


def test_best_scaling_sweep_keeps_better_committed_window(
    monkeypatch, tmp_path
):
    _patch_repo(monkeypatch, tmp_path)
    sidecar = tmp_path / "BENCH" / "scaling_best.json"

    # first run becomes the best and is persisted
    best, is_current = bench._best_scaling_sweep(_sweep(0.85))
    assert is_current and bench._sweep_primary_eff(best) == 0.85
    assert json.loads(sidecar.read_text())["pairs"][0]["efficiency"] == 0.85

    # a WORSE window must not displace it
    best, is_current = bench._best_scaling_sweep(_sweep(0.75))
    assert not is_current and bench._sweep_primary_eff(best) == 0.85
    assert json.loads(sidecar.read_text())["pairs"][0]["efficiency"] == 0.85

    # a BETTER window takes over
    best, is_current = bench._best_scaling_sweep(_sweep(0.9))
    assert is_current and bench._sweep_primary_eff(best) == 0.9
    assert json.loads(sidecar.read_text())["pairs"][0]["efficiency"] == 0.9

    # a corrupt sidecar degrades to the current run, never crashes
    sidecar.write_text("{not json")
    best, is_current = bench._best_scaling_sweep(_sweep(0.8))
    assert is_current and bench._sweep_primary_eff(best) == 0.8


def test_write_baseline_md_renders_best_sweep_and_merges_minima(
    monkeypatch, tmp_path
):
    _patch_repo(monkeypatch, tmp_path)
    p = tmp_path / "BENCH" / "BASELINE.md"
    # commit a good sweep first
    bench.write_baseline_md(_sweep(0.88), {"q_a": 2.0}, "/sf")
    text = p.read_text()
    assert "**0.88**" in text and "| q_a | 2.0 |" in text
    assert "This run's sweep IS the best committed sweep." in text
    # a slower window later: table keeps 0.88, current run noted, minima merge
    bench.write_baseline_md(_sweep(0.7), {"q_a": 2.5, "q_b": 1.0}, "/sf")
    text = p.read_text()
    assert "**0.88**" in text and "**0.7**" not in text
    assert "slower (primary 0.7)" in text
    assert "| q_a | 2.0 |" in text  # min kept
    assert "| q_b | 1.0 |" in text  # new row appended
