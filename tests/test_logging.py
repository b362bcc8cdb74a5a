"""Observability surface: JSONL metrics stream + optional wandb mirror
(reference surface: /root/reference/main.py:24,107,115,219,238-245)."""

import json
import sys
import types

from graphtrans_tpu.utils.logging import MetricsLogger, WandbSink


def test_metrics_logger_jsonl_and_summary(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(path, "run")
    m.log({"epoch": 1, "train/loss": 0.5})
    m.log({"epoch": 2, "train/loss": 0.25})
    m.set_summary("best/valid/ap", 0.9)
    recs = [json.loads(l) for l in open(path)]
    assert [r["epoch"] for r in recs] == [1, 2]
    assert all("ts" in r for r in recs)
    assert json.load(open(path + ".summary")) == {"best/valid/ap": 0.9}


def test_wandb_sink_noop_without_package(tmp_path, monkeypatch):
    """No wandb installed (this image): the sink degrades to a no-op and
    the JSONL stream keeps working."""
    monkeypatch.setitem(sys.modules, "wandb", None)  # forces ImportError
    sink = WandbSink("proj", "run")
    assert sink._run is None
    m = MetricsLogger(str(tmp_path / "m.jsonl"), "run", sink=sink)
    m.log({"epoch": 1})
    m.set_summary("k", 1.0)  # must not raise
    sink.finish()


def test_wandb_sink_mirrors_reference_surface(tmp_path, monkeypatch):
    """With a wandb module present, the sink reproduces the reference's
    calls: init(project), run name, config.update, log, summary, finish."""
    calls = {"log": [], "summary": {}, "finished": False}

    class FakeRun:
        def __init__(self):
            self.name = None
            self.config = types.SimpleNamespace(
                update=lambda cfg, allow_val_change=False: calls.__setitem__(
                    "config", dict(cfg)))
            self.summary = calls["summary"]

        def log(self, metrics):
            calls["log"].append(dict(metrics))

        def finish(self):
            calls["finished"] = True

    fake = types.ModuleType("wandb")
    fake.init = lambda project=None: (calls.__setitem__("project", project),
                                      FakeRun())[1]
    monkeypatch.setitem(sys.modules, "wandb", fake)

    sink = WandbSink("graph-aug", "my-run", config={"lr": 1e-4})
    m = MetricsLogger(str(tmp_path / "m.jsonl"), "my-run", sink=sink)
    m.log({"epoch": 1, "train/loss": 0.7})
    m.set_summary("best/valid/ap", 0.88)
    sink.finish()

    assert calls["project"] == "graph-aug"
    assert sink._run is None  # finished
    assert calls["log"] == [{"epoch": 1, "train/loss": 0.7}]
    assert calls["summary"] == {"best/valid/ap": 0.88}
    assert calls["config"]["lr"] == 1e-4
    assert calls["finished"]
