#!/usr/bin/env python
"""Per-stage device timing of the fused Pallas backward (the irreg
analogue of the round-4 rgbbox fwd+bwd decomposition — round-4 VERDICT
item 1): record forward once, then bench EACH backward stage in
isolation (per-segment replay kernels, boundary carry sorts, gflat
gathers, slot-table reduction), all same-session.

Run ON TPU:
  python tools/bwd_stage_bench.py --scene irreg --schedule 3 4 8 \
      --prefix 0 0.5 0.25 --block 64 32
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import camera, scenes
from raytracers_tpu.grad.pallas_replay_bwd import replay_bwd_pallas
from raytracers_tpu.render.api import prepare_scene
from raytracers_tpu.render.pallas_kernel import render_pallas_record_twophase
from raytracers_tpu.utils.timing import bench_salted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="irreg")
    ap.add_argument("--schedule", type=int, nargs="+", default=[3, 4, 8])
    ap.add_argument("--prefix", type=float, nargs="+", default=[0, .5, .25])
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--block", type=int, nargs=2, default=[64, 32])
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--runs", type=int, default=6)
    args = ap.parse_args()
    sched = tuple(args.schedule)
    pref = tuple(None if p <= 0 else p for p in args.prefix)
    blk = tuple(args.block)
    tile = args.tile
    W = H = 1000

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    sc = scenes.by_name(args.scene)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    prep = jax.block_until_ready(jax.jit(
        lambda s: prepare_scene(s, H, W, with_pallas=True,
                                with_bvh=False))(sc))
    scene = prep.pallas
    C = scene.n_clusters
    S = scene.order.size

    # one record forward -> residuals (device-resident)
    colours, aux = jax.block_until_ready(jax.jit(
        lambda sn: render_pallas_record_twophase(
            sn, cam, W, H, max_depth=args.depth, schedule=sched, tile=tile,
            block=blk, sort_prefix=pref))(scene))
    nt = aux["recs"][0].shape[0]
    Rp = nt * tile
    depths = list(sched) + [args.depth - sum(sched)]
    m = len(aux["poskeys"])
    print(f"{args.scene}: C={C} nt={nt} Rp={Rp} segments d={depths}",
          flush=True)

    bh, bw = blk
    wp = -(-W // bw) * bw
    blk_params = jnp.asarray([wp // bw, bw, bh, 1.0 / (wp // bw)],
                             jnp.float32)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([W, H, 1.0 / W, 1.0 / H], jnp.float32),
        blk_params]).astype(jnp.float32)

    gcot = jnp.zeros((nt, 16, tile), jnp.float32).at[:, 0:3, :].set(1.0)
    reduce_c = C if C <= 128 else None

    total = 0.0
    for k in range(m, -1, -1):
        rec_s, pay_s = aux["recs"][k], aux["pays"][k]
        state_s = None if k == 0 else aux["states16"][k - 1]
        bt = (k == 0)

        # residuals ride as jit ARGUMENTS: closed-over device arrays
        # embed as HLO constants, and the deep segment's pay (1.2 GB)
        # overflows the remote-compile request (HTTP 413)
        if state_s is None:
            def seg_fn(g, rec_s, pay_s, bt=bt, D_s=depths[k]):
                out = replay_bwd_pallas(params, rec_s, pay_s, g, tile=tile,
                                        max_depth=D_s,
                                        reduce_clusters=reduce_c,
                                        block_tiled=bt, state_rows=None)
                return sum(jnp.sum(o[:, :, ::37]) for o in out)

            def salt(i, rec_s=rec_s, pay_s=pay_s):
                return (gcot + jnp.float32(i) * 1e-30, rec_s, pay_s)
        else:
            def seg_fn(g, rec_s, pay_s, state_s, bt=bt, D_s=depths[k]):
                out = replay_bwd_pallas(params, rec_s, pay_s, g, tile=tile,
                                        max_depth=D_s,
                                        reduce_clusters=reduce_c,
                                        block_tiled=bt, state_rows=state_s)
                return sum(jnp.sum(o[:, :, ::37]) for o in out)

            def salt(i, rec_s=rec_s, pay_s=pay_s, state_s=state_s):
                return (gcot + jnp.float32(i) * 1e-30, rec_s, pay_s,
                        state_s)

        dt = bench_salted(jax.jit(seg_fn), salt, warmup=1, runs=args.runs)
        total += dt * 1e3
        print(f"  replay seg {k} (D={depths[k]}, state_in={k > 0}): "
              f"{dt*1e3:.2f} ms", flush=True)

    # boundary machinery: carry sort (9 rows + key) per boundary,
    # full-width vs the forward's prefix width
    for j in range(m):
        pos = aux["poskeys"][j] & ((1 << 30) - 1)
        rows = [jnp.zeros((Rp,), jnp.float32) for _ in range(9)]
        f = pref[j] if j < len(pref) else None
        B = (None if (f is None or f >= 1.0)
             else max(tile, int(Rp * f) // tile * tile))

        def sort_fn(p0, *rows, B=B):
            rows = list(rows)
            if B is not None and 0 < B < Rp:
                out = jax.lax.sort([p0[:B]] + [r[:B] for r in rows],
                                   dimension=0, num_keys=1)
            else:
                out = jax.lax.sort([p0] + rows, dimension=0, num_keys=1)
            return sum(jnp.sum(o[::37]) for o in out[1:])

        def salt(i, pos=pos, rows=rows):
            return (pos ^ (i & 0), *rows)   # value-identical (x ^ 0)

        dt = bench_salted(jax.jit(sort_fn), salt, warmup=1, runs=args.runs)
        total += dt * 1e3
        print(f"  carry sort boundary {j} (B={B}): {dt*1e3:.2f} ms",
              flush=True)

        def gath_fn(g3, pos, B=B):
            if B is not None and 0 < B < Rp:
                head = jnp.take(g3, pos[:B], axis=0)
                return jnp.sum(head[::37])
            return jnp.sum(jnp.take(g3, pos, axis=0)[::37])

        def salt2(i, pos=pos):
            return (jnp.ones((Rp, 3), jnp.float32) + jnp.float32(i) * 1e-30,
                    pos)

        dt = bench_salted(jax.jit(gath_fn), salt2, warmup=1, runs=args.runs)
        total += dt * 1e3
        print(f"  gflat gather boundary {j} (B={B}): {dt*1e3:.2f} ms",
              flush=True)

    # ---- XLA glue stages (the previously-unaccounted remainder) ------
    import numpy as np
    g_img = jnp.ones((H, W, 3), jnp.float32)

    def gflat_fn(g):
        wp2 = -(-W // bw) * bw
        hp2 = -(-H // bh) * bh
        gpad = jnp.pad(g, ((0, hp2 - H), (0, wp2 - W), (0, 0)))
        out = (gpad.reshape(hp2 // bh, bh, wp2 // bw, bw, 3)
               .transpose(0, 2, 1, 3, 4).reshape(Rp, 3))
        return jnp.sum(out[::37])

    dt = bench_salted(jax.jit(gflat_fn),
                      lambda i: (g_img + jnp.float32(i) * 1e-30,),
                      warmup=1, runs=args.runs)
    total += dt * 1e3
    print(f"  gflat build (image -> tile order): {dt*1e3:.2f} ms",
          flush=True)

    def rows16_fn(a3, c9):
        rows = [a3.T.reshape(3, nt, tile).transpose(1, 0, 2),
                c9.reshape(9, nt, tile).transpose(1, 0, 2),
                jnp.zeros((nt, 4, tile), jnp.float32)]
        out = jnp.concatenate(rows, axis=1)
        return jnp.sum(out[:, :, ::37])

    dt = bench_salted(
        jax.jit(rows16_fn),
        lambda i: (jnp.ones((Rp, 3), jnp.float32) + jnp.float32(i) * 1e-30,
                   jnp.ones((9, Rp), jnp.float32)),
        warmup=1, runs=args.runs)
    total += dt * 1e3
    print(f"  _rows16 assemble (per segment): {dt*1e3:.2f} ms", flush=True)

    # carry extract: (nt,16,T) kernel output -> 9 flat rows
    def carr_fn(c16):
        rows = [c16[:, r, :].reshape(Rp) for r in range(9)]
        return sum(jnp.sum(r[::37]) for r in rows)

    dt = bench_salted(
        jax.jit(carr_fn),
        lambda i: (jnp.ones((nt, 16, tile), jnp.float32)
                   + jnp.float32(i) * 1e-30,),
        warmup=1, runs=args.runs)
    total += dt * 1e3
    print(f"  carry row extract (per boundary): {dt*1e3:.2f} ms",
          flush=True)

    if reduce_c:
        def tab_fn(tbl):
            t = tbl.sum(axis=0).reshape(C, 3, 8, 128).sum(axis=1)
            tab_slot = t.transpose(0, 2, 1).reshape(S, 8)[:, :7]
            n_s = S
            tgt = jnp.arange(S) % (n_s + 1)
            tab = jnp.zeros((n_s + 1, 7), jnp.float32).at[tgt].add(tab_slot)
            return jnp.sum(tab[::13])

        dt = bench_salted(
            jax.jit(tab_fn),
            lambda i: (jnp.ones((1, C * 24, 128), jnp.float32)
                       + jnp.float32(i) * 1e-30,),
            warmup=1, runs=args.runs)
        total += dt * 1e3
        print(f"  slot-table reduce + scatter: {dt*1e3:.2f} ms", flush=True)

    def unscr_fn(c16):
        hp2 = -(-H // bh) * bh
        wp2 = -(-W // bw) * bw
        rays6 = (c16[:, 0:6, :].transpose(1, 0, 2)
                 .reshape(6, hp2 // bh, wp2 // bw, bh, bw)
                 .transpose(0, 1, 3, 2, 4).reshape(6, hp2, wp2)
                 [:, :H, :W].reshape(6, H * W))
        return jnp.sum(rays6[:, ::37])

    dt = bench_salted(
        jax.jit(unscr_fn),
        lambda i: (jnp.ones((nt, 16, tile), jnp.float32)
                   + jnp.float32(i) * 1e-30,),
        warmup=1, runs=args.runs)
    total += dt * 1e3
    print(f"  cotray unscramble (once): {dt*1e3:.2f} ms", flush=True)

    print(f"sum of isolated backward stages: {total:.1f} ms "
          f"(each row includes the ~6-9 ms dispatch floor; subtract it "
          f"per row for in-graph cost)", flush=True)


if __name__ == "__main__":
    main()
