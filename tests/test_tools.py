"""tools/trace_ops.py — the PERF.md per-op trace methodology as a tool.

Synthetic Chrome-trace fixtures (the format ``jax.profiler.trace`` dumps to
``*.trace.json.gz``): exact grouping/filter semantics without needing a
real TPU capture.
"""
import gzip
import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "trace_ops",
    os.path.join(os.path.dirname(__file__), "..", "tools", "trace_ops.py"))
trace_ops = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(trace_ops)


def _write_trace(tmp_path, events, gz=True):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    p = d / ("vm.trace.json.gz" if gz else "vm.trace.json")
    payload = json.dumps({"traceEvents": events})
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(payload)
    else:
        p.write_text(payload)
    return str(tmp_path)


def _meta(pid, pname, tid, tname):
    return [
        {"ph": "M", "name": "process_name", "pid": pid,
         "args": {"name": pname}},
        {"ph": "M", "name": "thread_name", "pid": pid, "tid": tid,
         "args": {"name": tname}},
    ]


_EVENTS = (
    _meta(1, "/device:TPU:0 (compute)", 10, "XLA Ops")
    + _meta(2, "/host:CPU", 20, "python")
    + [
        # grouped: fusion.123 + fusion.7 -> "fusion"
        {"ph": "X", "pid": 1, "tid": 10, "name": "fusion.123", "dur": 1500},
        {"ph": "X", "pid": 1, "tid": 10, "name": "fusion.7", "dur": 500},
        {"ph": "X", "pid": 1, "tid": 10, "name": "convolution.1", "dur": 250},
        # wrong lane (host python) — must be excluded
        {"ph": "X", "pid": 2, "tid": 20, "name": "fusion.9", "dur": 9999},
        # right pid, unnamed thread — excluded
        {"ph": "X", "pid": 1, "tid": 11, "name": "fusion.1", "dur": 9999},
        # non-X phase on the right lane — excluded
        {"ph": "B", "pid": 1, "tid": 10, "name": "fusion.2", "dur": 9999},
    ]
)


class TestSummarizeTrace:
    def test_groups_and_filters(self, tmp_path):
        root = _write_trace(tmp_path, _EVENTS)
        groups = trace_ops.summarize_trace(root, device_substr="/device:TPU")
        assert groups == {"fusion": (2.0, 2), "convolution": (0.25, 1)}

    def test_plain_json_and_direct_file(self, tmp_path):
        root = _write_trace(tmp_path, _EVENTS, gz=False)
        direct = os.path.join(root, "plugins", "profile",
                              "2026_01_01_00_00_00", "vm.trace.json")
        assert (trace_ops.summarize_trace(direct)
                == trace_ops.summarize_trace(root))

    def test_no_matching_lane_names_processes(self, tmp_path):
        # a CPU capture has no "XLA Ops" lane: the error must say what the
        # trace DOES contain instead of returning an empty table
        root = _write_trace(tmp_path, _meta(2, "/host:CPU", 20, "python") + [
            {"ph": "X", "pid": 2, "tid": 20, "name": "f.1", "dur": 10}])
        with pytest.raises(ValueError, match="/host:CPU"):
            trace_ops.summarize_trace(root)

    def test_missing_dump_named_error(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="jax.profiler.trace"):
            trace_ops.summarize_trace(str(tmp_path))

    def test_wrong_shape_json_named_error(self, tmp_path):
        d = tmp_path / "plugins" / "profile" / "x"
        d.mkdir(parents=True)
        (d / "vm.trace.json").write_text(json.dumps({"foo": 1}))
        with pytest.raises(ValueError, match="no 'traceEvents' key"):
            trace_ops.load_events(str(tmp_path))

    def test_nonpositive_steps_rejected(self, tmp_path, capsys):
        root = _write_trace(tmp_path, _EVENTS)
        import sys
        argv = sys.argv
        sys.argv = ["trace_ops", root, "--steps", "0"]
        try:
            with pytest.raises(SystemExit):
                trace_ops.main()
        finally:
            sys.argv = argv
        assert "--steps must be >= 1" in capsys.readouterr().err

    def test_cli_table(self, tmp_path, capsys):
        root = _write_trace(tmp_path, _EVENTS)
        import sys
        argv = sys.argv
        sys.argv = ["trace_ops", root, "--steps", "2", "--top", "1",
                    "--device", "/device:TPU"]
        try:
            trace_ops.main()
        finally:
            sys.argv = argv
        out = capsys.readouterr().out
        assert "fusion" in out and "1.000" in out        # 2.0 ms / 2 steps
        assert "TOTAL" in out and "1.125" in out         # 2.25 ms / 2 steps
        assert "1 more groups" in out
