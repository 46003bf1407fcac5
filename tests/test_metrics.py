"""MetricsLogger: JSONL sink + optional wandb mirror (training/metrics.py).

The wandb mirror is exercised with a stub module injected into sys.modules —
the real package isn't installed and the environment has no network
(reference logged via wandb, models/trainer.py wandb.log call sites)."""

import sys
import types

import numpy as np

from gesture_diffusion_tpu.training.metrics import MetricsLogger


def _stub_wandb(active: bool):
    stub = types.ModuleType("wandb")
    stub.calls = []
    stub.run = object() if active else None
    stub.log = lambda record, step=None: stub.calls.append((record, step))
    return stub


def test_jsonl_sink_and_wandb_mirror(tmp_path, monkeypatch):
    stub = _stub_wandb(active=True)
    monkeypatch.setitem(sys.modules, "wandb", stub)
    lg = MetricsLogger(str(tmp_path), config={"lr": 1e-4})
    lg.log({"train/loss": 0.5}, step=10)
    lg.log({"val/loss": 0.4}, step=20)
    recs = lg.read_all()
    assert [r["_step"] for r in recs] == [10, 20]
    assert recs[0]["train/loss"] == 0.5
    assert stub.calls == [({"train/loss": 0.5}, 10), ({"val/loss": 0.4}, 20)]


def test_wandb_mirror_skipped_without_active_run(tmp_path, monkeypatch):
    stub = _stub_wandb(active=False)
    monkeypatch.setitem(sys.modules, "wandb", stub)
    lg = MetricsLogger(str(tmp_path))
    lg.log({"train/loss": 1.0}, step=1)
    assert stub.calls == []
    assert lg.read_all()[0]["train/loss"] == 1.0


def test_no_wandb_is_fine(tmp_path, monkeypatch):
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    lg = MetricsLogger(str(tmp_path), run_id="fixed123")
    lg.log({"test/fgd": 3.2})
    assert lg.run_id == "fixed123"
    assert lg.read_all()[0]["test/fgd"] == 3.2


def test_vector_metric_logs_as_list(tmp_path):
    """numpy arrays define __float__ regardless of size; a size>1 metric
    must serialize as a list, not crash the run mid-epoch."""
    from gesture_diffusion_tpu.training.metrics import MetricsLogger

    lg = MetricsLogger(str(tmp_path))
    lg.log({"train/loss": np.float32(1.5),
            "train/per_joint": np.arange(3.0)}, step=1)
    rec = lg.read_all()[-1]
    assert rec["train/loss"] == 1.5
    assert rec["train/per_joint"] == [0.0, 1.0, 2.0]
