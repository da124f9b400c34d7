"""Checkpoint/timing/profiling utility tests."""
import os

import numpy as np
import jax.numpy as jnp

from raytracers_tpu import scenes
from raytracers_tpu.bvh.lbvh import build_bvh
from raytracers_tpu.bvh.traverse import closest_hit_bvh
from raytracers_tpu.geometry import Spheres
from raytracers_tpu.utils.checkpoint import (latest_checkpoint, load_bvh,
                                             load_spheres, save_bvh,
                                             save_spheres)
from raytracers_tpu.utils.timing import PhaseTimer, bench_fn


def test_bvh_roundtrip(tmp_path):
    sc = scenes.rgbbox()
    bvh = build_bvh(sc.spheres, leaf_size=8)
    path = str(tmp_path / "bvh.npz")
    save_bvh(path, bvh)
    loaded = load_bvh(path)
    # traversal through the loaded BVH must agree exactly
    o = jnp.asarray([[0., 30., 30.]] * 16)
    d = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3))
                    .astype(np.float32)) - jnp.asarray([[0., 1., 1.]])
    i1, t1 = closest_hit_bvh(bvh, o, d)
    i2, t2 = closest_hit_bvh(loaded, o, d)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_spheres_checkpoint_roundtrip(tmp_path):
    s = Spheres(jnp.ones((3, 3)), jnp.ones((3,)), jnp.zeros((3, 3)))
    p = str(tmp_path / "ckpt_5.npz")
    save_spheres(p, s, step=5, extra={"loss": 0.25})
    s2, step, extra = load_spheres(p)
    assert step == 5
    np.testing.assert_allclose(np.asarray(s2.center), 1.0)
    assert float(extra["loss"]) == 0.25


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for i in (1, 10, 2):
        save_spheres(str(tmp_path / f"ckpt_{i}.npz"),
                     Spheres(jnp.zeros((1, 3)), jnp.ones((1,)),
                             jnp.zeros((1, 3))), step=i)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_10.npz")


def test_bench_fn_and_phase_timer():
    timer = PhaseTimer()
    dt = timer.measure("noop", lambda: jnp.ones(4), warmup=1, runs=2)
    assert dt >= 0
    assert "noop" in timer.report()


def test_validate_bvh_accepts_good_and_catches_bad():
    from raytracers_tpu.utils.validate import validate_bvh, validate_spheres
    sc = scenes.rgbbox()
    bvh = build_bvh(sc.spheres, leaf_size=8)
    assert validate_bvh(bvh) == []
    assert validate_spheres(sc.spheres) == []
    # corrupt a node AABB -> containment violation must be reported
    bad = bvh._replace(node_min=bvh.node_min.at[0].set(1e9))
    assert any("AABB" in p for p in validate_bvh(bad))
    # corrupt a LEAF skip link (the walk descends left at inner nodes, so
    # only leaf skips steer it) -> threading violation
    bad2 = bvh._replace(skip=bvh.skip.at[bvh.n_inner].set(-1))
    assert any("skip" in p for p in validate_bvh(bad2))
    # bad spheres
    import jax.numpy as jnp
    s = sc.spheres._replace(radius=sc.spheres.radius.at[0].set(-1.0))
    assert validate_spheres(s)


def test_profiling_metrics():
    from raytracers_tpu.utils.profiling import Metrics
    m = Metrics(100, 50, "rgbbox")
    m.phase("bvh", 0.002).phase("render", 0.01)
    data = m.dump(None) if False else m.data
    assert data["render_ms"] == 10.0
    assert abs(data["mrays_per_s"] - 100 * 50 / 0.01 / 1e6) < 1e-9


def test_distributed_single_process():
    from raytracers_tpu.parallel.distributed import (init,
                                                     scaling_efficiency)
    info = init()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8
    assert abs(scaling_efficiency(100.0, 680.0, 8) - 0.85) < 1e-9


def test_npz_suffix_normalisation(tmp_path):
    # save('ckpt')/load('ckpt') must round-trip (np.savez appends .npz)
    s = Spheres(jnp.ones((2, 3)), jnp.ones((2,)), jnp.zeros((2, 3)))
    p = str(tmp_path / "bare")
    save_spheres(p, s, step=1)
    s2, step, _ = load_spheres(p)
    assert step == 1


def test_train_state_resume_no_regression(tmp_path):
    """A fit resumed from a checkpoint must continue exactly: the optimizer
    state (Adam moments) is restored, so losses after resume match an
    uninterrupted run step for step."""
    import jax
    from jax.sharding import Mesh
    from raytracers_tpu import camera as mk_camera
    from raytracers_tpu.grad.inverse import recover
    from raytracers_tpu.render.api import prepare_scene
    from raytracers_tpu.render.api import render_float

    sc = scenes.rgbbox()
    cam = mk_camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    prep = prepare_scene(sc, 16, 16)
    target = np.asarray(render_float(prep, 16, 16, mode="brute",
                                     max_depth=2))
    init = sc.spheres._replace(color=jnp.clip(sc.spheres.color + 0.2, 0, 1))
    mesh = Mesh(np.array(jax.devices()[:1]), ("rays",))

    losses_a = []
    recover(target, cam, init, mesh, steps=4, lr=5e-2, max_depth=2,
            callback=lambda i, l, s: losses_a.append(l))

    # interrupted run: 2 steps with checkpointing, then resume to 4
    ckdir = str(tmp_path / "ck")
    recover(target, cam, init, mesh, steps=2, lr=5e-2, max_depth=2,
            checkpoint_dir=ckdir, checkpoint_every=1)
    losses_b = []
    recover(target, cam, init, mesh, steps=4, lr=5e-2, max_depth=2,
            checkpoint_dir=ckdir, checkpoint_every=10,
            callback=lambda i, l, s: losses_b.append(l))
    np.testing.assert_allclose(losses_b, losses_a[2:], rtol=1e-5)


def test_probe_tpu_cpu_fallback():
    """probe_tpu returns False on the CPU test platform and leaves the
    process usable (no exception when the accelerator is absent/held)."""
    import jax

    from raytracers_tpu.utils.platform import probe_tpu

    assert probe_tpu() is False
    assert jax.devices()[0].platform == "cpu"
