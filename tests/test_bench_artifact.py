"""The driver records bench.py's ONE-line JSON through a bounded tail
capture (~2000 chars). Round 4 embedded the full scaling attempt cache in
that line, pushed ``{"metric": ...`` out of the window, and the driver
recorded ``parsed: null`` — a green round with no visible perf numbers.
These tests pin the compact-summary contract so it can't regress.
"""

import json
import os

import bench

REPO = os.path.dirname(os.path.abspath(bench.__file__))

# generous: tail capture is ~2000 chars, and the non-scaling part of the
# driver line (queries map etc.) measured ~500 bytes in round 4
_SCALING_BUDGET = 1200


def _fake_cache():
    return {
        "events": 1_000_000,
        "sf": "sf0.1",
        "codec": "zstd",
        "max_files_per_trigger": 8,
        "attempts_sec": {str(k): [1.0] * 40 for k in (2, 8, 32)},
        "extract_attempts_sec": {str(k): [1.0] * 40 for k in (2, 8, 32)},
        "pairs": [
            {
                "parallelism_low": lo,
                "parallelism_high": hi,
                "seconds_low": 100.0,
                "seconds_high": 30.0,
                "events_per_sec_low": 1.0,
                "events_per_sec_high": 1.0,
                "scaling_efficiency": 0.8,
                "host_cpu_control_efficiency": 0.9,
                "host_mem_control_efficiency": 0.85,
                "extract_stage_seconds_low": 90.0,
                "extract_stage_seconds_high": 25.0,
                "extract_stage_efficiency": 0.9,
                "repeat_pair_efficiencies": [0.5] * 40,
                "best_repeat_pair_efficiency": 0.9,
                "primary_efficiency": 0.9,
            }
            for lo, hi in ((2, 8), (8, 32))
        ],
    }


def test_summary_is_bounded_regardless_of_attempt_count():
    s = bench._scaling_summary(_fake_cache())
    assert len(json.dumps(s)) < _SCALING_BUDGET
    # the raw arrays must NOT leak into the driver line
    assert "attempts_sec" not in s
    for p in s["pairs"]:
        assert "repeat_pair_efficiencies" not in p
        assert "mem_control_pair_efficiencies" not in p


def test_summary_keeps_the_verdict_fields():
    s = bench._scaling_summary(_fake_cache())
    assert s["attempts_per_level"] == {"2": 40, "8": 40, "32": 40}
    p = s["pairs"][0]
    assert p["primary_efficiency"] == 0.9
    assert p["best_of_mins_efficiency"] == 0.8
    assert p["host_cpu_control_efficiency"] == 0.9
    assert p["host_mem_control_efficiency"] == 0.85


def test_live_driver_line_fits_tail_capture():
    """Build the driver line exactly as default mode does (from the real
    on-disk caches) and assert it fits the driver's tail window."""
    out = {
        "metric": "cdc_merge_apply_replay",
        "value": 6.03,
        "unit": "sec",
        "queries": {q: 9.999 for q in bench.HEADLINE_QUERIES},
        "sf": "0.1",
        "events": 1_000_000,
        "events_per_sec": 165800.0,
    }
    if os.path.exists(bench.SCALING_CACHE):
        out["scaling"] = bench._scaling_summary(json.load(open(bench.SCALING_CACHE)))
    extra = bench._other_profile_summaries()
    if extra:
        out["scaling_other_profiles"] = extra
    line = json.dumps(out)
    assert len(line) < 1950, f"driver line {len(line)} bytes risks truncation"
    json.loads(line)  # one valid JSON object


def test_other_profiles_come_from_checked_in_snapshots():
    for rec in bench._other_profile_summaries():
        assert rec["events"] != bench.HEADLINE_PROFILE["events"] or rec["sf"] != bench.HEADLINE_PROFILE["sf"]
        required = {"events", "sf", "pair", "primary_efficiency", "host_cpu_control_efficiency"}
        # certified field is OMITTED unless a quiet window landed (byte budget)
        assert set(rec) - {"best_certified_pair_efficiency"} == required


def test_summary_certified_field_respects_the_band():
    """best_certified_pair_efficiency = best window pair whose same-window
    mem control lies INSIDE MEM_CONTROL_CERT_BAND: sub-band (contended)
    and super-band (inconsistent — the low leg itself was degraded)
    controls certify nothing."""
    cache = _fake_cache()
    cache["window_pairs"] = {"8:32": [[100.0, 30.0], [120.0, 40.0], [110.0, 28.0], [100.0, 26.0]]}
    cache["window_pair_mem_controls"] = {"8:32": [0.5, 0.95, 1.681, None]}
    s = bench._scaling_summary(cache)
    by = {(p["parallelism_low"], p["parallelism_high"]): p for p in s["pairs"]}
    # only the 0.95-control pair is in-band: (120/40)/4 = 0.75
    assert by[(8, 32)]["best_certified_pair_efficiency"] == 0.75
    # no attribution at all → key omitted (driver-line byte budget), never a guess
    assert "best_certified_pair_efficiency" not in by[(2, 8)]


def test_prediction_validation_section_discloses_every_pair():
    """The out-of-sample (4M-backlog) section must list EVERY recorded
    8->32 window pair of each validation profile — append-only disclosure,
    no curation — and state the fit's prediction it is testing."""
    section = bench._prediction_validation_section()
    if not section:  # no validation profile checked in (fresh clone)
        return
    assert "Out-of-sample test of the fit" in section
    cache = json.load(open(os.path.join(REPO, "BENCH", "scaling_4000000ev.json")))
    pairs = cache.get("window_pairs", {}).get("8:32", [])
    assert pairs, "validation profile lost its window pairs"
    for t8, t32 in pairs:
        assert f"{t8:.1f}s → {t32:.1f}s" in section
    # verdict is one of the two honest states, never silence
    assert ("control-certified window" in section) or ("No control-certified quiet window" in section)
