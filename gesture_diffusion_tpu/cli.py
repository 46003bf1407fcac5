#!/usr/bin/env python
"""Phase CLI: prep / data / train / eval / eval-time / gen.

Drop-in equivalent of the reference driver (``/root/reference/main.py``):
same flags (--phase, --config, --seed), same config schema
(configs/beat-ours.json), same artifact layout (log/{name}/chkpts,
results/eval_results.json, results/samples/sample_{i}.pkl).

Differences by design: one process drives all chips (no mp.spawn /
process groups — ``Train.world_size`` maps to the mesh's data axis), and a
``Data.synthetic`` block generates a self-contained random dataset for
smoke runs without the BEAT corpus.
"""

import json
import os
import pickle
import time
from argparse import ArgumentParser

import numpy as np

from gesture_diffusion_tpu.data.beat import preprocess_data
from gesture_diffusion_tpu.data.pipeline import load_processed_datasets
from gesture_diffusion_tpu.data.pose_converter import PoseTypeConverter
from gesture_diffusion_tpu.generation import Generator
from gesture_diffusion_tpu.generation.eval_utils import (
    beat_consistency_score,
    beat_recall_score,
)
from gesture_diffusion_tpu.models import build_all
from gesture_diffusion_tpu.parallel import make_mesh
from gesture_diffusion_tpu.training import Trainer
from gesture_diffusion_tpu.training import steps_per_epoch as _steps_per_epoch
from gesture_diffusion_tpu.training.checkpoint import (
    checkpoint_path,
    load_checkpoint,
)
from gesture_diffusion_tpu.utils import JsonConfig, parse_steps
from gesture_diffusion_tpu.utils.rng import fix_seed


def make_synthetic_samples(config):
    """Create {split}_samples.pkl from noise so every phase runs without
    the BEAT corpus (smoke/test mode)."""
    syn = config.Data.synthetic
    spt = config.Data.spt_dir_path
    os.makedirs(spt, exist_ok=True)
    rng = np.random.default_rng(0)
    fps_src = 120
    seconds = syn.get("seconds", 4)
    n_joints = syn.get("n_joints", 4)
    for split, n in [("train", syn.get("n_train", 8)),
                     ("val", syn.get("n_val", 4)),
                     ("test", syn.get("n_test", 4))]:
        # int casts: JSON configs may give fractional seconds (4.5)
        t = np.linspace(0, seconds, int(seconds * fps_src))[:, None, None]
        freqs = rng.uniform(0.5, 2.0, (n, 1, n_joints * 3))
        pose = 25 * np.sin(2 * np.pi * freqs * t.transpose(1, 0, 2))
        pose = (pose + rng.normal(0, 2, pose.shape)).astype(np.float32)
        wav = rng.normal(
            0, 0.3, (n, int(seconds * config.Data.wav_sr))).astype(np.float32)
        with open(os.path.join(spt, f"{split}_samples.pkl"), "wb") as f:
            pickle.dump({"hid": np.zeros(n), "pose": pose, "wav": wav}, f)
    print(f"[Info] Synthetic samples written to {spt}")


def ensure_hierarchy_template(config):
    """Generate ``Data.hierarchy_path`` from the corpus if it is missing.

    The reference ships hand-trimmed skeleton templates in-tree
    (``/root/reference/datasets/hierarchy_upper.txt``, referenced from
    ``configs/beat-ours.json:13``); we derive the same artifact from the
    first corpus BVH instead — the predicted-joint ancestor closure plus
    ``Data.hierarchy_extra_joints`` (the neck chain the viewer still
    draws), verified offset-exact against the reference template in
    ``tests/test_data.py``.  Runs during prep and lazily before eval/gen,
    so the repo needs no absolute paths into external trees."""
    hier = config.Data.get("hierarchy_path")
    if not hier or os.path.exists(hier) or config.Data.get("synthetic"):
        return
    import glob

    from gesture_diffusion_tpu.data.bvh import (
        ancestor_closure,
        hierarchy_text,
        parse_bvh,
        prune_hierarchy,
    )

    src = config.Data.src_dir_path
    bvh_paths = [p for hid in config.Data.human_ids
                 for p in sorted(glob.glob(os.path.join(src, str(hid), "*.bvh")))]
    if not bvh_paths:
        raise FileNotFoundError(
            f"hierarchy template {hier} does not exist and no corpus BVH "
            f"was found under {src} to derive it from; run --phase prep "
            "with the corpus available (or provide the file)")
    skel = parse_bvh(bvh_paths[0])
    joints = config.Data.get("joints")
    if joints:
        extra = config.Data.get("hierarchy_extra_joints", ["Neck", "Neck1"])
        # extras go through the closure too: prune_hierarchy's walk only
        # reaches joints whose whole parent chain is kept, so a bare union
        # would silently drop an extra with an un-kept parent
        keep = ancestor_closure(
            skel, list(joints) + [j for j in extra if j in skel.joints])
        skel = prune_hierarchy(skel, keep)
    os.makedirs(os.path.dirname(os.path.abspath(hier)), exist_ok=True)
    with open(hier, "w") as f:
        f.write(hierarchy_text(skel))
    print(f"[Info] Hierarchy template derived from {bvh_paths[0]} -> {hier}")


def preprocess(config):
    if config.Data.get("synthetic"):
        make_synthetic_samples(config)
        return
    preprocess_data(
        src_dir_path=config.Data.src_dir_path,
        human_ids=config.Data.human_ids,
        pose_fps=config.Data.pose_fps,
        wav_sr=config.Data.wav_sr,
        sample_duration=config.Data.sample_duration,
        spt_dir_path=config.Data.spt_dir_path,
        joints=config.Data.get("joints"))
    ensure_hierarchy_template(config)


def load_datasets(config):
    if config.Data.get("synthetic") and not os.path.exists(
            os.path.join(config.Data.spt_dir_path, "train_samples.pkl")):
        make_synthetic_samples(config)
    return load_processed_datasets(
        pose_fps=config.Data.pose_fps,
        wav_sr=config.Data.wav_sr,
        spt_dir_path=config.Data.spt_dir_path,
        dst_dir_path=config.Data.dst_dir_path,
        pose_window_len=config.Data.pose_window_len,
        pose_stride_len=config.Data.pose_stride_len,
        pose_representation=config.Data.pose_representation)


def _mesh_from_config(config):
    world = config.Train.get("world_size", "auto")
    if world == "auto":
        return make_mesh()
    return make_mesh(n_data=int(world))


def train_model(config):
    train_ds, val_ds, _ = load_datasets(config)
    d_pose = train_ds.get_dims()["d_pose"]
    bundle = build_all(config, d_pose, is_training=True,
                       dtype=config.Train.get("dtype"),
                       encoder_dtype=config.Train.get("encoder_dtype"))
    log_dir = os.path.join(config.Meta.log_dir, config.Meta.name)
    trainer = Trainer(
        bundle.model, bundle.schedule, bundle.optimizer, bundle.lr_schedule,
        train_ds.as_arrays(), val_ds.as_arrays(),
        batch_size=config.Train.batch_size,
        log_dir=log_dir,
        seed=config.Meta.seed,
        metric=config.Train.get("metric", "val_loss"),
        goal=config.Train.get("goal", "minimize"),
        loss_params=(dict(config.Train.Loss) if config.Train.get("Loss") else None),
        grad_norm_clip_value=config.Train.get("grad_norm_clip_value"),
        grad_clip_value=config.Train.get("grad_clip_value"),
        mesh=_mesh_from_config(config),
        config=config.to_dict(),
        start_chkpt=config.Model.get("start_chkpt"),
        steps_per_call=config.Train.get("steps_per_call", 1),
        schedule_sampler=config.Train.get("schedule_sampler"))
    steps_per_epoch = max(1, _steps_per_epoch(
        len(train_ds.as_arrays()), config.Train.batch_size))
    max_epochs = max(1, round(
        parse_steps(config.Train.max_training_steps) / steps_per_epoch))
    early_stop = max(1, round(
        parse_steps(config.Train.get("early_stop_threshold_in_step",
                                     config.Train.max_training_steps))
        / steps_per_epoch))
    print(f"[Info] Max epochs: {max_epochs} | Early stop (epochs): {early_stop}")
    trainer.train(max_epochs, early_stop)


def load_eval_objs(config):
    import jax.numpy as jnp

    _, _, test_ds = load_datasets(config)
    d_pose = test_ds.get_dims()["d_pose"]
    bundle = build_all(config, d_pose, is_training=False)
    log_dir = os.path.join(config.Meta.log_dir, config.Meta.name)
    chkpt = checkpoint_path(log_dir, config.Meta.seed)
    print(f"[Info] Load chkpt from {chkpt}")
    model = bundle.model
    sample = test_ds.get_samples()
    variables = model.init(
        __import__("jax").random.key(0),
        jnp.asarray(sample["pose"][:1]),
        jnp.zeros((1,), jnp.int32),
        jnp.asarray(sample["wav"][:1]), train=False)
    tree, meta = load_checkpoint(chkpt, {
        "state": {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})},
        "best_params": variables["params"]})
    variables = {"params": tree["best_params"],
                 "batch_stats": tree["state"]["batch_stats"]}
    # multi-chip hosts: hand the Generator a data-axis mesh so the fused
    # sampler runs one kernel instance per chip (shard_map; see
    # docs/SERVING.md).  Single-device is unchanged; batches that do not
    # divide the data axis (including eval-time's fixed batch of 1) run
    # the fused kernel unsharded on one device, so the latency metric
    # stays fused and comparable.  Multi-PROCESS runs get no mesh: the
    # CLI feeds host-local arrays, which a global-mesh shard_map cannot
    # place on non-addressable devices — each host evals replicated on
    # its local chips instead (callers wanting cross-host sharded
    # sampling build global arrays through the library API; see
    # tests/test_multiprocess.py).
    jax_ = __import__("jax")
    mesh = (make_mesh(devices=jax_.local_devices())
            if jax_.process_count() == 1 and jax_.local_device_count() > 1
            else None)
    generator = Generator(model, variables, bundle.eval_schedule,
                          bundle.eval_timestep_map, mesh=mesh)
    return meta, test_ds, generator


def _pose_converter(config):
    scaler = os.path.join(config.Data.dst_dir_path, "scaler.npz")
    if not os.path.exists(scaler):
        scaler = os.path.join(config.Data.dst_dir_path, "scaler.jl")
    ensure_hierarchy_template(config)
    return PoseTypeConverter(scaler, config.Data.hierarchy_path,
                             joint_names=config.Data.get("joints"))


def evaluate(config):
    import jax
    import jax.numpy as jnp

    meta, dataset, generator = load_eval_objs(config)
    repr_ = config.Data.pose_representation
    to_dir_vec = None
    if config.Data.get("hierarchy_path"):
        ptc = _pose_converter(config)
        to_dir_vec = {
            "6d": ptc.scaled_ortho6d_to_dir_vec,
            "log_rot": ptc.scaled_log_rot_to_dir_vec,
            "euler": ptc.scaled_euler_to_dir_vec,
        }[repr_]

    samples = dataset.get_samples()
    n = len(samples["pose"])
    batch_size = min(64, n)
    num_batches = -(-n // batch_size)
    gen_cfg = config.Model.get("Generate")
    metrics, output_all = {}, []
    rng = jax.random.key(config.Meta.seed)
    for i in range(num_batches):
        st = time.perf_counter()
        poses = jnp.asarray(samples["pose"][i * batch_size:(i + 1) * batch_size])
        wavs = jnp.asarray(samples["wav"][i * batch_size:(i + 1) * batch_size])
        rng, r1, r2 = jax.random.split(rng, 3)

        # bpd_t_block batches k independent timesteps per model call —
        # measured -17% eval wall at k=4 on the real chip (PERF.md round
        # 5); default 1 keeps the reference-exact call pattern
        diffusion_terms = generator.eval_bpd(
            poses, wavs, r1,
            pose_seed_len=(gen_cfg.get("pose_seed_len") if gen_cfg else None),
            t_block=(gen_cfg.get("bpd_t_block", 1) if gen_cfg else 1))
        for name, value in diffusion_terms.items():
            # per-batch 1/num_batches weighting slightly over-weights a
            # ragged final batch — bug-compat with /root/reference/main.py:180
            v = float(np.asarray(value).mean()) / num_batches
            metrics[name] = metrics.get(name, 0.0) + v

        inpaint_poses = inpaint_masks = None
        if generator.model.cfg.model_type == "inpaint":
            seed_len = gen_cfg.pose_seed_len
            inpaint_poses = poses
            inpaint_masks = jnp.zeros(poses.shape[:2] + (1,)
                                      ).at[:, :seed_len].set(1.0)
        out = np.asarray(generator.generate_sample(
            wavs, poses.shape[2], poses.shape[1], r2,
            inpaint_poses=inpaint_poses, inpaint_masks=inpaint_masks,
            sample_alg="ddim",
            trans_factor=(gen_cfg.get("trans_factor") if gen_cfg else None),
            pose_seed_len=(gen_cfg.get("pose_seed_len") if gen_cfg else None)))

        if to_dir_vec is not None:
            out_dv = to_dir_vec(out)
            gt_dv = to_dir_vec(np.asarray(poses))
            bc = beat_consistency_score(
                out_dv.reshape(*out_dv.shape[:2], -1, 3),
                config.Data.pose_fps, ptc.angle_pairs,
                np.asarray(wavs), config.Data.wav_sr) / num_batches
            br = beat_recall_score(
                out_dv.reshape(*out_dv.shape[:2], -1, 3),
                gt_dv.reshape(*gt_dv.shape[:2], -1, 3),
                config.Data.pose_fps, ptc.angle_pairs) / num_batches
            metrics["beat_consistency"] = metrics.get("beat_consistency", 0.0) + bc
            metrics["beat_recall"] = metrics.get("beat_recall", 0.0) + br

        output_all.append(out)
        print(f"[Info] Batch {i + 1}/{num_batches} | "
              f"{time.perf_counter() - st:.2f}s")

    # optional FGD in embedding space (reference Eval.fgd, tedexp config)
    fgd_cfg = (config.get("Eval") or {}).get("fgd") if config.get("Eval") else None
    if fgd_cfg is not None:
        from gesture_diffusion_tpu.generation.fgd import (
            EmbeddingSpaceEvaluator,
            load_or_train_motion_ae,
        )

        train_ds, _, _ = load_datasets(config)
        # pinned-by-default: the embedding net is trained ONCE (seeded) and
        # cached next to the run, so consecutive evals score identical FGD
        # (the reference used a fixed pretrained net for the same reason)
        default_net = os.path.join(config.Meta.log_dir, config.Meta.name,
                                   "fgd_motion_ae.msgpack")
        ae_model, ae_vars = load_or_train_motion_ae(
            fgd_cfg.get("eval_net_path") or default_net,
            train_ds.get_samples()["pose"],
            latent_dim=fgd_cfg.get("latent_dim", 32),
            steps=fgd_cfg.get("train_steps", 2000))
        ev = EmbeddingSpaceEvaluator(ae_model, ae_vars)
        ev.push_samples(np.concatenate(output_all, axis=0),
                        np.asarray(samples["pose"]))
        fd, feat_dist = ev.get_scores()
        metrics["fgd"] = fd
        metrics["feat_dist"] = feat_dist
        metrics["diversity"] = ev.get_diversity_scores()

    test_log = {f"test/{k}": v for k, v in metrics.items()}
    result_dir = os.path.join(config.Meta.log_dir, config.Meta.name, "results")
    os.makedirs(result_dir, exist_ok=True)
    with open(os.path.join(result_dir, "eval_results.json"), "w") as f:
        json.dump(test_log, f, indent=2)
    # append test metrics into the training run's metrics stream (the
    # reference resumes the wandb run and logs there, main.py:270-278)
    run_id = meta.get("run_id")
    if run_id:
        from gesture_diffusion_tpu.training.metrics import MetricsLogger

        MetricsLogger(os.path.join(config.Meta.log_dir, config.Meta.name),
                      run_id=run_id).log(test_log)
    with open(os.path.join(result_dir, "generated.pkl"), "wb") as f:
        pickle.dump({"out": np.concatenate(output_all, axis=0),
                     "pose": samples["pose"], "wav": samples["wav"]}, f)
    print(f"[Info] Results written to {result_dir}")
    print(json.dumps(test_log, indent=2))


def eval_infer_time(config):
    import jax.numpy as jnp

    _, dataset, generator = load_eval_objs(config)
    samples = dataset.get_samples()
    wavs = jnp.asarray(samples["wav"][:1])
    d_pose = samples["pose"].shape[2]
    window = samples["pose"].shape[1]
    mean_ms, std_ms, steps_per_sec = generator.eval_infer_time(
        wavs, d_pose, window)
    # name the path like bench.py does: a silent fused->scan fallback
    # would otherwise change this metric's meaning across runs
    print(f"[Info] DDIM loop: {mean_ms:.2f} +- {std_ms:.2f} ms "
          f"({steps_per_sec:.0f} denoise steps/s, "
          f"path={generator.last_sample_path})")


def generate(config):
    import jax
    import jax.numpy as jnp

    _, dataset, generator = load_eval_objs(config)
    ptc = _pose_converter(config) if config.Data.get("hierarchy_path") else None
    seqs = dataset.get_seqs()
    pose_seqs = np.asarray(seqs["pose"])
    wav_seqs = jnp.asarray(seqs["wav"])
    gen_cfg = config.Model.Generate

    out_seqs = generator.generate_sequence(
        wav_seqs, config.Data.wav_sr, pose_seqs.shape[2],
        config.Data.pose_fps, config.Data.pose_window_len,
        gen_cfg.pose_seed_len,
        rng=jax.random.key(config.Meta.seed),
        smooth_trans=bool(gen_cfg.get("smooth_transition")),
        trans_factor=gen_cfg.get("trans_factor"),
        init_poses=jnp.asarray(pose_seqs[:, :gen_cfg.pose_seed_len]))

    out_dir = os.path.join(config.Meta.log_dir, config.Meta.name,
                           "results/samples")
    os.makedirs(out_dir, exist_ok=True)
    repr_ = config.Data.pose_representation
    for i, out_seq in enumerate(out_seqs):
        pose_seq = pose_seqs[i]
        if ptc is not None and repr_ == "6d":
            out_seq = ptc.scaled_ortho6d_to_euler(out_seq)
            pose_seq = ptc.scaled_ortho6d_to_euler(pose_seq)
        elif ptc is not None and repr_ == "log_rot":
            out_seq = ptc.scaled_log_rot_to_euler(out_seq)
            pose_seq = ptc.scaled_log_rot_to_euler(pose_seq)
        path = os.path.join(out_dir, f"sample_{i}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"pose": pose_seq, "wav": np.asarray(seqs["wav"][i]),
                         "out": out_seq}, f)
        print(f"[Info] Saved to {path}")


def main():
    parser = ArgumentParser()
    parser.add_argument("--phase", type=str, required=True,
                        help="Select from [prep, data, train, eval, eval-time, gen].")
    parser.add_argument("--config", type=str, metavar="PATH", required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    config = JsonConfig(args.config)
    config.update({"Meta.phase": args.phase, "Meta.config_path": args.config,
                   "Meta.seed": args.seed})
    fix_seed(args.seed)

    phases = {
        "prep": preprocess,
        "data": load_datasets,
        "train": train_model,
        "eval": evaluate,
        "eval-time": eval_infer_time,
        "gen": generate,
    }
    if args.phase not in phases:
        raise ValueError(f"phase {args.phase} not supported.")
    phases[args.phase](config)


if __name__ == "__main__":
    main()
