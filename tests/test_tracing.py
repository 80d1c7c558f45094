"""utils.tracing: the device-trace parser behind bench.py's p99 and
bench_matrix's device column (rate claims come from device traces, not
wall clock through the relay)."""

import gzip
import json

from tpufg.utils.tracing import module_durations_ms


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_module_durations_parses_xla_modules_lane(tmp_path):
    events = [
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 2,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 3,
         "args": {"name": "XLA Ops"}},
        # two invocations of the step module (duration in us)
        {"ph": "X", "pid": 1, "tid": 2, "name": "jit_step", "dur": 4480},
        {"ph": "X", "pid": 1, "tid": 2, "name": "jit_step", "dur": 4520},
        # a different module on the same lane
        {"ph": "X", "pid": 1, "tid": 2, "name": "jit_other", "dur": 100},
        # same-named event on a NON-module lane must be ignored
        {"ph": "X", "pid": 1, "tid": 3, "name": "jit_step", "dur": 9999},
    ]
    mods = module_durations_ms(_write_trace(tmp_path, events))
    assert mods["jit_step"] == [4.48, 4.52]
    assert mods["jit_other"] == [0.1]


def test_module_durations_empty_without_trace(tmp_path):
    assert module_durations_ms(str(tmp_path)) == {}
