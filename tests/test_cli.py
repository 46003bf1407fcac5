"""End-to-end CLI smoke: all six phases through main.py on synthetic data.

Runs in-process (imports main) on the CPU mesh to avoid a fresh jax init
per phase; uses a scratch copy of the smoke config with a tmp workspace.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main as cli  # noqa: E402
from gesture_diffusion_tpu.utils import JsonConfig  # noqa: E402


@pytest.fixture(scope="module")
def config(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    with open(os.path.join(os.path.dirname(__file__), "..", "configs",
                           "smoke.json")) as f:
        raw = json.load(f)
    raw["Data"]["spt_dir_path"] = str(tmp / "spt")
    raw["Data"]["dst_dir_path"] = str(tmp / "dst")
    raw["Meta"] = {"project": "smoke", "log_dir": str(tmp / "log"),
                   "name": "smoke", "seed": 0}
    cfg_path = str(tmp / "smoke.json")
    with open(cfg_path, "w") as f:
        json.dump(raw, f)
    cfg = JsonConfig(cfg_path)
    cfg.update({"Meta.seed": 0})
    return cfg


def test_phases_end_to_end(config):
    cli.preprocess(config)
    assert os.path.exists(os.path.join(config.Data.spt_dir_path,
                                       "train_samples.pkl"))

    train, val, test = cli.load_datasets(config)
    assert train.get_dims()["d_pose"] == 12

    cli.train_model(config)
    log_dir = os.path.join(config.Meta.log_dir, config.Meta.name)
    assert os.path.exists(os.path.join(
        log_dir, "chkpts", "chkpt_seed0.msgpack"))

    cli.evaluate(config)
    with open(os.path.join(log_dir, "results", "eval_results.json")) as f:
        results = json.load(f)
    assert np.isfinite(results["test/total_bpd"])
    with open(os.path.join(log_dir, "results", "generated.pkl"), "rb") as f:
        gen = pickle.load(f)
    assert gen["out"].shape == gen["pose"].shape

    cli.eval_infer_time(config)

    cli.generate(config)
    sample_path = os.path.join(log_dir, "results", "samples", "sample_0.pkl")
    with open(sample_path, "rb") as f:
        sample = pickle.load(f)
    assert sample["out"].shape == (80, 12)  # 4 s @ 20 fps
    assert np.isfinite(sample["out"]).all()


def test_json_config_merge_does_not_alias_children():
    """merged()/the constructor must deep-copy nested nodes: set() on a
    merged config previously mutated the SOURCE configs through shared
    child references, breaking the immutability contract."""
    from gesture_diffusion_tpu.utils import JsonConfig

    c1 = JsonConfig({"Train": {"lr": 1e-4}, "Data": {"wav_sr": 16000}})
    c2 = JsonConfig({"Eval": {"fgd": True}})
    c3 = c1 + c2
    c3.set("Train.lr", 999.0)
    assert c1.Train.lr == 1e-4
    inner = JsonConfig({"a": 1})
    outer = JsonConfig({"sub": inner})
    outer.set("sub.a", 42)
    assert inner.a == 1
