"""bench.py driver machinery: _stream_child's line forwarding, budget
kill, and stall-clock kill — the BENCH_r04 lesson ("a timeout must never
erase lines already measured") pinned as unit behavior.

_stream_child(here, names, ...) runs `python <here> --only <names>`;
pointing `here` at a stub script exercises the full subprocess path
without touching jax or the TPU.
"""

import os
import sys
import textwrap

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _stub(tmp_path, body: str) -> str:
    p = tmp_path / "stub_bench.py"
    p.write_text(textwrap.dedent("""\
        import argparse, json, sys, time
        ap = argparse.ArgumentParser()
        ap.add_argument("--only", default="")
        args = ap.parse_args()
        """) + textwrap.dedent(body))
    return str(p)


def test_stream_child_forwards_json_lines_immediately(tmp_path, capfd):
    here = _stub(tmp_path, """\
        for name in args.only.split(","):
            print(json.dumps({"metric": name, "value": 1}), flush=True)
            print("progress chatter", flush=True)
        """)
    ok = bench._stream_child(here, ("a", "b"), timeout=30.0)
    out, err = capfd.readouterr()
    assert ok
    lines = [l for l in out.splitlines() if l.startswith("{")]
    assert [eval(l)["metric"] for l in lines] == ["a", "b"]
    # chatter is rerouted to stderr so the driver's last-line parse
    # always sees a metric
    assert "progress chatter" in err
    assert "progress chatter" not in out


def test_stream_child_budget_kill_keeps_printed_lines(tmp_path, capfd):
    here = _stub(tmp_path, """\
        print(json.dumps({"metric": "fast", "value": 1}), flush=True)
        time.sleep(60)
        print(json.dumps({"metric": "slow", "value": 2}), flush=True)
        """)
    ok = bench._stream_child(here, ("grp",), timeout=10.0)
    out, err = capfd.readouterr()
    assert ok                       # the fast line was captured
    assert '"fast"' in out and '"slow"' not in out
    assert "budget timeout" in err


def test_stream_child_stall_kill_fires_before_budget(tmp_path, capfd):
    here = _stub(tmp_path, """\
        print(json.dumps({"metric": "one", "value": 1}), flush=True)
        time.sleep(60)              # silent: wedged child
        """)
    import time as _t
    t0 = _t.monotonic()
    ok = bench._stream_child(here, ("grp",), timeout=120.0,
                             stall_timeout=8.0)
    took = _t.monotonic() - t0
    out, err = capfd.readouterr()
    assert ok and '"one"' in out
    assert took < 60, took          # killed by the stall clock, not budget
    assert "no output" in err


def test_stream_child_liveness_resets_stall_clock(tmp_path, capfd):
    # emits a line every 0.5s for 3s: total > stall_timeout, but the
    # gaps are below it, so the child must be allowed to finish
    here = _stub(tmp_path, """\
        for i in range(6):
            time.sleep(0.5)
            print(json.dumps({"metric": f"m{i}", "value": i}), flush=True)
        """)
    ok = bench._stream_child(here, ("grp",), timeout=120.0,
                             stall_timeout=8.0)
    out, _ = capfd.readouterr()
    assert ok
    assert sum(1 for l in out.splitlines() if l.startswith("{")) == 6


def test_stream_child_reports_nonzero_exit(tmp_path, capfd):
    here = _stub(tmp_path, """\
        print("dying", file=sys.stderr)
        sys.exit(3)
        """)
    ok = bench._stream_child(here, ("grp",), timeout=30.0)
    _, err = capfd.readouterr()
    assert not ok
    assert "rc=3" in err and "dying" in err


def test_groups_cover_order_exactly():
    """Every bench name appears in exactly one group, and ORDER is the
    flattened group list (the --only validation contract)."""
    flat = [n for _, ns in bench.GROUPS for n in ns]
    assert flat == list(bench.ORDER)
    assert len(set(flat)) == len(flat)
    assert bench.GROUPS[-1][0] == "layouts"  # headline group is last
