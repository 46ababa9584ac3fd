"""The bench's stdout envelope: the driver tails the last 2000 chars
of stdout and json-parses the final line; BENCH_r01 and BENCH_r10
both came back parsed:null when per-query detail inlined in the line
outgrew that window.  These tests pin the budget machinery without
running any queries (bench.compact_line is pure)."""

import json

import bench


def _mk_timings(n, name_len=34):
    # worst-ish case: long plan names, 3-decimal values
    return {
        f"plan_{i:03d}_" + "x" * name_len: round(0.1 * i + 0.123, 3)
        for i in range(n)
    }


def _base(timings, **over):
    base = {
        "metric": "total_query_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "value_calib_norm": 123.456,
        "timing_semantics": bench._TIMING_SEMANTICS,
        "n_queries": len(timings),
        "n_reruns": 12,
        "build_cold_total": 98.765,
        "calib_sec": [0.551, 0.552],
        "loadavg": [31.12, 28.5, 19.75],
        "probe_ref_sec": 0.0512,
        "suspect": ["plan_199_" + "x" * 34, "plan_198_" + "x" * 34],
        "detail_file": "tools/bench_full.json",
        "sf": 0.1,
    }
    base.update(over)
    return base


def test_line_fits_budget_and_parses():
    t = _mk_timings(200)
    line = bench.compact_line(_base(t), t)
    assert len(line) <= bench._LINE_BUDGET
    d = json.loads(line)
    assert d["metric"] == "total_query_wall_clock"
    assert d["n_queries"] == 200
    assert d["timing_semantics"] == bench._TIMING_SEMANTICS
    assert d["value_calib_norm"] == 123.456
    assert d["detail_file"] == "tools/bench_full.json"
    # the fold bucket accounts for every non-listed plan
    listed = [k for k in d["queries"] if not k.startswith("_")]
    assert len(listed) + d["queries"]["_fast_bucket_n"] == 200


def test_line_shrinks_top_n_under_pathological_names():
    # 120-char plan names: 15 entries would blow the budget; the
    # helper must shrink the listed set rather than overflow
    t = _mk_timings(60, name_len=120)
    line = bench.compact_line(_base(t), t)
    assert len(line) <= bench._LINE_BUDGET
    d = json.loads(line)
    listed = [k for k in d["queries"] if not k.startswith("_")]
    assert 1 <= len(listed) < 15


def test_line_degrades_to_headline_never_raises():
    # fixed fields alone near/over budget (absurd sf string): the
    # helper must still emit a parseable headline with queries={},
    # not raise after the whole sweep already ran
    t = _mk_timings(10, name_len=400)
    line = bench.compact_line(_base(t, sf="y" * 1400), t)
    d = json.loads(line)  # parseable no matter what
    assert d["value"] == round(sum(t.values()), 3)
    assert d["queries"] == {}


def test_total_is_preserved_exactly():
    t = _mk_timings(192)
    d = json.loads(bench.compact_line(_base(t), t))
    assert d["value"] == round(sum(t.values()), 3)


def test_suspect_flags_survive_in_line():
    # the contention markers (top-15 plans whose accepted runs all ran
    # under a busy probe) must reach the stdout line within budget
    t = _mk_timings(200)
    line = bench.compact_line(_base(t), t)
    assert len(line) <= bench._LINE_BUDGET
    d = json.loads(line)
    assert d["suspect"] == ["plan_199_" + "x" * 34, "plan_198_" + "x" * 34]
