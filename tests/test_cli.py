"""End-to-end CLI smoke: all six phases through main.py on synthetic data.

Runs in-process (imports main) on the CPU mesh to avoid a fresh jax init
per phase.  Parameterized over BOTH shipped experiment configs —
``beat-ours.json`` (s2g_v2 + oneway decoder + noamxf + log_rot) and
``tedexp-ours.json`` (default model + cross_attention decoder + noam +
euler) — loading the REAL files and overriding only sizes/paths, so a
stale key or schema drift in either shipped config fails the suite (the
reference shipped a ``tedexp-ours.json`` its own factory could not read,
SURVEY.md defects).
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


def _deep_merge(dst: dict, src: dict) -> dict:
    for key, value in src.items():
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            _deep_merge(dst[key], value)
        else:
            dst[key] = value
    return dst


# scale-down overrides only: every shape-defining key (model type, decoder
# type, representation, scheduler type, fps/window/stride, Generate block
# except bpd_t_block, which is coupled to diffusion_steps) comes from the
# shipped config under test
_SCALE_DOWN = {
    "Data": {"synthetic": {"n_train": 8, "n_val": 4, "n_test": 4,
                           "seconds": 4, "n_joints": 4},
             "sample_duration": 4.0},
    "Model": {"d_model": 32,
              "Decoder": {"heads": 4, "n_layers": 1},
              "Diffusion": {"diffusion_steps": 50,
                            "timestep_respacing": "ddim10"},
              # shipped bpd_t_block=4 assumes the shipped T=1000; it must
              # divide the scaled-down respaced T=10 (still exercises the
              # k>1 tiled bpd path through the CLI)
              "Generate": {"bpd_t_block": 2}},
    "Train": {"batch_size": 8, "max_training_steps": "10",
              "early_stop_threshold_in_step": "10"},
}


@pytest.fixture(scope="module", params=["beat-ours.json", "tedexp-ours.json"])
def config(request, tmp_path_factory):
    name = request.param
    tmp = tmp_path_factory.mktemp(name.replace(".json", ""))
    with open(os.path.join(os.path.dirname(__file__), "..", "configs",
                           name)) as f:
        raw = json.load(f)
    _deep_merge(raw, _SCALE_DOWN)
    raw["Data"]["spt_dir_path"] = str(tmp / "spt")
    raw["Data"]["dst_dir_path"] = str(tmp / "dst")
    # synthetic data is not the BEAT 41-joint skeleton: the dir-vec
    # converter path (hierarchy_path + joints) needs the real corpus
    raw["Data"].pop("hierarchy_path", None)
    raw["Data"].pop("joints", None)
    if raw["Train"].get("Scheduler", {}).get("d_model"):
        raw["Train"]["Scheduler"]["d_model"] = 32
    if raw.get("Eval", {}).get("fgd"):
        raw["Eval"]["fgd"].update({
            "eval_net_path": str(tmp / "dst" / "fgd_ae.msgpack"),
            "latent_dim": 8, "train_steps": 60})
    raw["Meta"] = {"project": "smoke", "log_dir": str(tmp / "log"),
                   "name": "smoke", "seed": 0}
    cfg_path = str(tmp / name)
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
    if config.get("Eval") and config.Eval.get("fgd"):
        assert np.isfinite(results["test/fgd"])
    with open(os.path.join(log_dir, "results", "generated.pkl"), "rb") as f:
        gen = pickle.load(f)
    assert gen["out"].shape == gen["pose"].shape

    cli.eval_infer_time(config)

    cli.generate(config)
    sample_path = os.path.join(log_dir, "results", "samples", "sample_0.pkl")
    with open(sample_path, "rb") as f:
        sample = pickle.load(f)
    n_frames = int(config.Data.synthetic.seconds * config.Data.pose_fps)
    assert sample["out"].shape == (n_frames, 12)
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


def test_json_config_malformed_file_named_errors(tmp_path):
    """A broken config file fails with the FILE NAMED in the error (a bare
    JSONDecodeError is unplaceable from the CLI), and a non-object root
    raises a clear format error instead of AttributeError (fuzz finding)."""
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(ValueError, match="bad.json.*invalid JSON"):
        JsonConfig(str(bad))
    arr = tmp_path / "arr.json"
    arr.write_text("[1, 2, 3]")
    with pytest.raises(ValueError, match="root must be a JSON object"):
        JsonConfig(str(arr))


def test_main_argv_wiring(tmp_path, monkeypatch, capsys):
    """cli.main() parses argv, loads the config, stamps Meta.*, seeds, and
    dispatches the phase function — tested at the argv level (the phase
    bodies themselves are covered by test_phases_end_to_end)."""
    from gesture_diffusion_tpu import cli as pkg_cli

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({"Data": {"wav_sr": 16000}}))
    seen = {}
    monkeypatch.setattr(pkg_cli, "preprocess",
                        lambda config: seen.setdefault("config", config))
    monkeypatch.setattr(sys, "argv", [
        "gesture-diffusion", "--phase", "prep",
        "--config", str(cfg_path), "--seed", "7"])
    pkg_cli.main()
    config = seen["config"]
    assert config.Meta.phase == "prep"
    assert config.Meta.seed == 7
    assert config.Meta.config_path == str(cfg_path)
    assert config.Data.wav_sr == 16000

    # unknown phase: named error, raised before any phase work
    monkeypatch.setattr(sys, "argv", [
        "gesture-diffusion", "--phase", "bogus", "--config", str(cfg_path)])
    with pytest.raises(ValueError, match="bogus"):
        pkg_cli.main()

    # missing required flags: argparse exits 2 with usage
    monkeypatch.setattr(sys, "argv", ["gesture-diffusion"])
    with pytest.raises(SystemExit) as exc:
        pkg_cli.main()
    assert exc.value.code == 2
    assert "--phase" in capsys.readouterr().err

    # the shim module re-exports the same driver (reference invocation
    # `python main.py --phase ...` runs the packaged code)
    assert cli.main is pkg_cli.main


def test_cli_module_entry_standalone():
    """`python -m gesture_diffusion_tpu.cli --help` works from a clean
    subprocess — proves the packaged module entry (and therefore the
    `gesture-diffusion` console script target, which calls the same
    main()) resolves without the repo-root main.py shim."""
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "gesture_diffusion_tpu.cli", "--help"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "--phase" in out.stdout and "--config" in out.stdout
