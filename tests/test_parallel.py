"""Multi-device correctness: sharded sampling equals unsharded; mesh
helpers behave."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu.diffusion import make_diffusion, ddim_sample_loop
from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
from gesture_diffusion_tpu.training import init_opt_state
from gesture_diffusion_tpu.parallel import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_and_replicate_placement():
    mesh = make_mesh()
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert not sharded["x"].sharding.is_fully_replicated
    rep = replicate({"w": np.ones((3, 3), np.float32)}, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_multihost_mesh_batch_assembly_any_device_order():
    """iter_batches' multihost+mesh branch derives each device's global
    rows from the sharding's own indices map — so a mesh built with a
    PERMUTED device order must still assemble batches whose global row
    order matches the logical selection (the contiguous-span assumption
    the old host_slice pairing silently made; ADVICE r2)."""
    from gesture_diffusion_tpu.training import ArrayDataset
    from gesture_diffusion_tpu.training.data import iter_batches

    data = {
        "wav": np.arange(64, dtype=np.float32).reshape(16, 4),
        "pose": np.arange(16 * 6, dtype=np.float32).reshape(16, 2, 3),
    }
    ds = ArrayDataset(data)
    devices = jax.devices()
    perm = [devices[i] for i in (3, 0, 6, 1, 7, 2, 5, 4)]
    for mesh in (make_mesh(), make_mesh(devices=perm)):
        batches = list(iter_batches(ds, 8, shuffle=False, mesh=mesh,
                                    process_count=2, process_index=0))
        assert len(batches) == 2
        for b, batch in enumerate(batches):
            got = np.asarray(batch["wav"])
            np.testing.assert_array_equal(got, data["wav"][b * 8:(b + 1) * 8])
            assert not batch["wav"].sharding.is_fully_replicated
            np.testing.assert_array_equal(np.asarray(batch["pose"]),
                                          data["pose"][b * 8:(b + 1) * 8])


def test_tensor_parallel_train_step_matches_dp():
    """DP x TP (4x2) train step produces the same loss as DP-only (8x1):
    XLA's SPMD partitioner handles the Megatron-style shardings."""
    import jax.numpy as jnp
    import optax

    from gesture_diffusion_tpu.diffusion import make_schedule, linear_betas
    from gesture_diffusion_tpu.parallel.tp import (
        apply_shardings,
        tensor_parallel_shardings,
    )
    from gesture_diffusion_tpu.training import TrainState, make_train_step

    model = GestureDenoiser(DenoiserConfig(d_pose=12, d_model=64, heads=4,
                                           n_layers=2))
    sched = make_schedule(linear_betas(50))
    opt = optax.adamw(1e-4)
    rng = np.random.default_rng(0)
    batch = {"pose": jnp.asarray(rng.normal(size=(8, 8, 12)).astype(np.float32)),
             "wav": jnp.asarray(rng.normal(0, 0.3, (8, 8000)).astype(np.float32))}
    variables = model.init(jax.random.key(0), batch["pose"][:2],
                           jnp.zeros((2,), jnp.int32), batch["wav"][:2],
                           train=False)
    step = make_train_step(model, sched, opt, None)

    def fresh():
        p = jax.tree.map(jnp.copy, variables["params"])
        return TrainState(p, jax.tree.map(jnp.copy, variables["batch_stats"]),
                          init_opt_state(opt, p), jnp.asarray(0, jnp.int32))

    mesh_dp = make_mesh(n_data=8)
    s = TrainState(*replicate(tuple(fresh()), mesh_dp))
    _, m_dp = step(s, shard_batch(batch, mesh_dp), jax.random.key(1))

    mesh = make_mesh(n_data=4, n_model=2)
    base = fresh()
    shardings = tensor_parallel_shardings(base.params, mesh)
    n_sharded = sum(1 for sh in jax.tree.leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec")) if any(sh.spec))
    # 2 layers x 10 sharded kernels each: self-attn {q,k,v,out} +
    # cross-attn {q,k,v,out} + ff {layer1,layer2} (dconv/bias/LN replicated)
    assert n_sharded == 20
    params_tp = apply_shardings(base.params, shardings)
    s_tp = TrainState(params_tp, replicate(base.batch_stats, mesh),
                      init_opt_state(opt, params_tp), jnp.asarray(0, jnp.int32))
    new_state, m_tp = step(s_tp, shard_batch(batch, mesh), jax.random.key(1))
    assert abs(float(m_dp["loss"]) - float(m_tp["loss"])) < 1e-4
    # shardings survive the optimizer update
    qk = new_state.params["decoder"]["layer0"]["self_attn"]["query"]["kernel"]
    assert not qk.sharding.is_fully_replicated


def test_sharded_sampling_matches_single_device():
    """DDIM over a data-sharded batch must equal the unsharded result —
    the eval path is DP-safe by construction."""
    cfg = DenoiserConfig(d_pose=6, d_model=32, heads=4, n_layers=1)
    model = GestureDenoiser(cfg)
    n, t = 8, 8
    wav = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.3, (n, 8000)).astype(np.float32))
    variables = model.init(jax.random.key(0), jnp.zeros((n, t, 6)),
                           jnp.zeros((n,), jnp.int32), wav, train=False)
    sched, tmap = make_diffusion("linear", 50, "ddim5", is_training=False)
    noise = jax.random.normal(jax.random.key(1), (n, t, 6))

    def sample(variables, wav, noise):
        memory = model.apply(variables, wav, train=False,
                             method=GestureDenoiser.encode_memory)

        def model_fn(x, tt):
            return model.apply(variables, x, tt, memory, train=False,
                               method=GestureDenoiser.denoise)

        return ddim_sample_loop(sched, model_fn, noise, jax.random.key(2),
                                timestep_map=jnp.asarray(tmap))

    plain = jax.jit(sample)(variables, wav, noise)

    mesh = make_mesh()
    sharded_out = jax.jit(sample)(
        replicate(variables, mesh),
        jax.device_put(wav, data_sharding(mesh)),
        jax.device_put(noise, data_sharding(mesh)))
    # sharded execution reorders reductions; tolerance covers float noise
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded_out),
                               atol=1e-3)


class TestMultiHostDataSharding:
    """Per-host dataset slicing (DistributedSampler semantics,
    models/trainer.py:29,35) — process layout faked via the injectable
    process_index/process_count arguments."""

    def test_host_slice_disjoint_and_covering(self):
        from gesture_diffusion_tpu.training.data import host_slice
        idx = np.random.default_rng(0).permutation(64)
        parts = [host_slice(idx, r, 4) for r in range(4)]
        assert all(len(p) == 16 for p in parts)
        assert sorted(np.concatenate(parts)) == sorted(idx)
        flat = set()
        for p in parts:
            assert flat.isdisjoint(p)
            flat |= set(p)

    def test_host_slice_rejects_indivisible(self):
        from gesture_diffusion_tpu.training.data import host_slice
        with pytest.raises(ValueError):
            host_slice(np.arange(10), 0, 4)

    def test_faked_hosts_reassemble_the_global_batch(self):
        from gesture_diffusion_tpu.training.data import (ArrayDataset,
                                                         iter_batches)
        rng = np.random.default_rng(3)
        ds = ArrayDataset({"pose": rng.normal(size=(24, 5, 2)),
                           "wav": rng.normal(size=(24, 7))})
        # single-host reference epoch
        global_batches = list(iter_batches(
            ds, 8, rng=np.random.default_rng(11), shuffle=True,
            process_index=0, process_count=1))
        # each fake host runs the SAME seeded permutation
        per_host = [list(iter_batches(
            ds, 8, rng=np.random.default_rng(11), shuffle=True,
            process_index=r, process_count=4)) for r in range(4)]
        assert len(global_batches) == 3
        for b in range(3):
            for key in ("pose", "wav"):
                stacked = np.concatenate(
                    [np.asarray(per_host[r][b][key]) for r in range(4)], axis=0)
                np.testing.assert_array_equal(
                    stacked, np.asarray(global_batches[b][key]))


def test_fused_sampler_under_shard_map():
    """The fused single-kernel DDIM sampler composes with multi-chip data
    parallelism: one kernel instance per shard via ``shard_map`` over the
    mesh "data" axis produces the unsharded result (interpret mode on the
    virtual CPU mesh; on hardware each chip holds its own VMEM-resident
    weight copy)."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    from gesture_diffusion_tpu.models.attention import (
        sinusoidal_position_encoding)
    from gesture_diffusion_tpu.ops import fused_sampler as fs

    d_pose, t_win, n = 12, 8, 4
    cfg = DenoiserConfig(d_pose=d_pose, d_model=256, heads=8, n_layers=1)
    model = GestureDenoiser(cfg)
    wav = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.3, (n, 8000)).astype(np.float32))
    variables = model.init(jax.random.key(0), jnp.zeros((n, t_win, d_pose)),
                           jnp.zeros((n,), jnp.int32), wav, train=False)
    sched, tmap = make_diffusion("linear", 50, "ddim5", is_training=False)

    packed = fs.pack_oneway_denoiser(variables["params"], d_pose, t_win,
                                     weight_dtype=jnp.float32)
    coefs = jnp.asarray(fs.ddim_coefficients(sched))
    tmap = jnp.asarray(np.asarray(tmap)[:, None].astype(np.int32))
    mem = model.apply(variables, wav, train=False,
                      method=GestureDenoiser.encode_memory)
    pe = jnp.asarray(sinusoidal_position_encoding(5000, 256))
    emm = variables["params"]["decoder"]["emb_mem"]
    rows = mem @ emm["kernel"] + emm["bias"] + pe[1:mem.shape[1] + 1]
    mem_rows = jnp.concatenate(
        [jnp.zeros((n, 1, 256)), rows], axis=1).astype(jnp.float32)

    dp_pad = 128
    x_T = jax.random.normal(jax.random.key(1), (n, t_win, dp_pad))
    blend_a = jnp.zeros((n, t_win, dp_pad))
    blend_b = jnp.ones((n, t_win, dp_pad))

    run = functools.partial(
        fs.fused_ddim_sample, n_layers=1, heads=8, num_steps=tmap.shape[0],
        compute_dtype=jnp.float32, interpret=True, n_clips=1)

    plain = run(packed, x_T, mem_rows, tmap, coefs, blend_a, blend_b)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded_fn = jax.shard_map(
        lambda xt, mr, ba, bb: run(packed, xt, mr, tmap, coefs, ba, bb),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        # the pallas_call's ShapeDtypeStruct carries no vma annotation;
        # per-shard invocation is trivially correct under pure DP
        check_vma=False)
    sharded = sharded_fn(x_T, mem_rows, blend_a, blend_b)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               atol=1e-5)


def test_multihost_ragged_final_batch_truncates():
    """drop_last=False with a final batch not divisible by process_count:
    the ragged tail is truncated per-host-even instead of raising at epoch
    end (review finding)."""
    from gesture_diffusion_tpu.training.data import ArrayDataset, iter_batches

    n = 22                                 # 16 + ragged 6 (not % 4)
    ds = ArrayDataset({"pose": np.arange(n * 2.0).reshape(n, 1, 2),
                       "wav": np.zeros((n, 8))})
    got = [b["pose"].shape[0] for b in iter_batches(
        ds, 16, shuffle=False, drop_last=False,
        process_index=0, process_count=4)]
    # global batches 16 then 6 -> truncated to 4; each host sees 1/4
    assert got == [4, 1]


def test_single_host_mesh_ragged_final_batch_truncates():
    """drop_last=False on a single-host mesh previously CRASHED on the
    ragged final batch (shard_batch device_put needs divisibility); it now
    truncates to the largest data-axis multiple like the multihost path."""
    from gesture_diffusion_tpu.training.data import ArrayDataset, iter_batches

    mesh = make_mesh()                     # 8-device virtual mesh
    n = 18                                 # 8 + 8 + ragged 2 -> dropped
    ds = ArrayDataset({"pose": np.arange(n * 2.0).reshape(n, 1, 2),
                       "wav": np.zeros((n, 8))})
    got = [b["pose"].shape[0] for b in iter_batches(
        ds, 8, shuffle=False, drop_last=False, mesh=mesh)]
    assert got == [8, 8]
    n = 20                                 # ragged 4 -> kept (divisible by 8? no)
    ds = ArrayDataset({"pose": np.arange(n * 2.0).reshape(n, 1, 2),
                       "wav": np.zeros((n, 8))})
    got = [b["pose"].shape[0] for b in iter_batches(
        ds, 16, shuffle=False, drop_last=False, mesh=mesh)]
    assert got == [16]                     # tail of 4 < 8 -> dropped


def test_indivisible_batch_size_is_a_clear_error():
    """A batch_size no FULL batch can shard (not divisible by hosts x data
    axis) is a misconfiguration: loud ValueError up front, not an epoch of
    silently-truncated (or zero) batches."""
    from gesture_diffusion_tpu.training.data import ArrayDataset, iter_batches

    ds = ArrayDataset({"pose": np.zeros((24, 1, 2)), "wav": np.zeros((24, 8))})
    with pytest.raises(ValueError, match="not divisible"):
        list(iter_batches(ds, 6, shuffle=False,
                          process_index=0, process_count=4))
    mesh = make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        list(iter_batches(ds, 12, shuffle=False, mesh=mesh))   # 12 % 8


def test_make_mesh_rejects_silent_device_drop():
    """Implicit n_data must use every device; n_model that leaves a
    remainder raises instead of silently running on a subset.  Explicit
    n_data below the device count stays allowed (Train.world_size)."""
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(n_model=3)               # 8 % 3
    with pytest.raises(ValueError, match="needs"):
        make_mesh(n_data=8, n_model=2)     # 16 > 8 devices
    m = make_mesh(n_data=2, n_model=2)     # deliberate subset: fine
    assert dict(m.shape) == {"data": 2, "model": 2}


def test_tensor_parallel_shardings_handle_list_and_attr_trees():
    """path_str must render SequenceKey (int idx) and GetAttrKey paths —
    list-containing trees crashed str.join, and attr paths rendered with a
    leading dot so endswith() never matched (weights silently replicated)."""
    from gesture_diffusion_tpu.parallel.tp import tensor_parallel_shardings

    mesh = make_mesh(n_data=4, n_model=2)
    params = {"layers": [{"query": {"kernel": jnp.zeros((8, 8))}},
                         {"ff": {"layer1": {"kernel": jnp.zeros((8, 16))}}}]}
    sh = tensor_parallel_shardings(params, mesh)          # no TypeError
    assert not sh["layers"][0]["query"]["kernel"].is_fully_replicated
    assert not sh["layers"][1]["ff"]["layer1"]["kernel"].is_fully_replicated
