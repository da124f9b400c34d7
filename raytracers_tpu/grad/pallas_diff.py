"""Differentiable rendering through the Pallas megakernel (the north-star
fwd+bwd path, BASELINE.json).

Structure (the reference's two-phase hit makes this clean —
futhark/ray.fut:76-86):

  forward  — the megakernel runs at full speed in ``record`` mode,
             emitting float colours AND a compact per-bounce path record
             (winner sphere slot / miss / absorb / inactive, int32
             (D, R)).  Discrete outputs carry no gradient.

  backward — the recorded paths are replayed differentiably by the
             existing XLA replay (grad/diff_render.replay_paths): all
             continuous quantities (re-intersection t, hit point, normal,
             reflection, attenuation, sky) are recomputed from the live
             sphere parameters, and ``jax.vjp`` pulls the image cotangent
             back to d(loss)/d(center, radius, colour) — and through the
             primary rays to the camera.

This is exact away from visibility discontinuities: the true gradient
does not move the discrete path there (same argument as diff_render.py).
The kernel records winners as SORTED sphere slots; they are converted to
original sphere indices with the build's order table, so gradients land
on the caller's sphere array directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import MAX_DEPTH, Camera, Spheres
from ..render.pallas_kernel import (build_pallas_scene,
                                    render_pallas_record,
                                    render_pallas_record_twophase)
from ..render.tracer import primary_rays
from .diff_render import (EV_ABSORB, EV_BOUNCE, EV_INACTIVE, EV_MISS,
                          replay_paths)


def _rec_to_path(rec_orig):
    """(D, R) kernel record -> (idxs, events) for replay_paths."""
    idxs = jnp.maximum(rec_orig, 0).astype(jnp.int32)
    events = jnp.where(
        rec_orig >= 0, EV_BOUNCE,
        jnp.where(rec_orig == -1, EV_MISS,
                  jnp.where(rec_orig == -3, EV_ABSORB,
                            EV_INACTIVE))).astype(jnp.uint8)
    return idxs, events


def make_render_pallas_diff(width: int, height: int,
                            max_depth: int = MAX_DEPTH, tile: int = 512,
                            interpret: bool = False,
                            bwd_chunks: int = 1, gather: str = "onehot",
                            remat: bool = True,
                            sort_by_depth: bool = False,
                            skip_dead: bool | None = None,
                            backward: str = "pallas",
                            block: tuple | None = None,
                            phase1_depth: int | None = None,
                            schedule: tuple | None = None,
                            sort_prefix: tuple | None = None,
                            cluster_width: int | None = None):
    """Build a differentiable ``f(spheres, cam) -> colours (h, w, 3)``
    whose forward pass is the Pallas megakernel.

    ``bwd_chunks`` splits the backward replay into ray chunks to bound
    peak memory at large resolutions (the replay scan keeps per-step
    residuals alive).

    ``sort_by_depth`` compacts the backward replay the same way the
    forward renderer compacts survivors: rays are permuted by descending
    path depth before chunking (one fused key-sort + one row-gather of
    the stacked per-ray state; cotangents are unsorted with the inverse
    permutation), so each chunk is depth-homogeneous and its replay scan
    can skip all-dead step groups via ``lax.cond`` (``skip_dead``).
    Default OFF: measured on v5e, the sort itself is cheap (~30 ms at
    1e6 rays) but XLA's cond overhead exceeds the skipped work at every
    granularity tried (per-step +520 ms, per-8-step group +190 ms vs
    the work saved — see docs/PERF_NOTES.md), so the naive dense replay
    wins.  Kept as a measured experiment; only effective with
    ``bwd_chunks > 1``.

    ``backward`` selects the gradient engine: "pallas" (default) runs
    the fused TPU backward-replay kernel (grad/pallas_replay_bwd.py —
    the forward additionally records per-bounce winner fields, the
    backward is one Pallas program per ray tile plus a batched bf16
    one-hot segment-sum); "xla" is the whole-batch scan replay
    (diff_render.replay_paths).  Gradients agree to f32 accumulation
    order (tests/test_pallas_diff.py).

    ``block=(bh, bw)`` (backward="pallas" only) runs both passes over
    2-D image-rectangle tiles with bh*bw == tile — same speedup as the
    forward renderer's block mode (tighter per-tile cluster unions).

    ``phase1_depth=p`` (backward="pallas" only) compacts survivors after
    p bounces exactly like render_pallas_twophase — both the forward
    record AND the backward replay run the deep segment on compacted
    rays, with the 9-row cotangent carry handed across the boundary.
    ``schedule`` generalises it to several boundaries (the forward is
    render_pallas_record_twophase's multi-phase mode; the backward
    replays segments deep-to-shallow, unpermuting the carry across each
    boundary)."""
    if backward == "pallas":
        if schedule is None and phase1_depth:
            schedule = (phase1_depth,)
        return _make_render_pallas_diff_kernel(width, height, max_depth,
                                               tile, interpret, block,
                                               schedule, sort_prefix,
                                               cluster_width)

    @jax.custom_vjp
    def render_diff(spheres: Spheres, cam: Camera):
        colours, _ = _forward(spheres, cam)
        return colours

    def _forward(spheres, cam):
        scene = build_pallas_scene(spheres)
        colours, rec = render_pallas_record(
            scene, cam, width, height, max_depth=max_depth, tile=tile,
            interpret=interpret)
        order_flat = scene.order.reshape(-1)
        # winner slots -> original sphere indices (padding slots are
        # radius-0 and can never win, so order >= 0 wherever rec >= 0)
        rec_orig = jnp.where(rec >= 0,
                             order_flat[jnp.clip(rec, 0, None)], rec)
        return colours, rec_orig

    def fwd(spheres, cam):
        colours, rec_orig = _forward(spheres, cam)
        return colours, (spheres, cam, rec_orig)

    def bwd(res, g):
        spheres, cam, rec_orig = res
        o, d = primary_rays(cam, width, height)
        R = o.shape[0]
        gflat = g.reshape(-1, 3)

        perm = None
        if sort_by_depth and bwd_chunks > 1:
            # permute rays by descending path depth (depth = count of
            # non-INACTIVE steps).  Unique keys ((D-depth)*R + id) make
            # the sort a stable partition; ONE row-gather of the stacked
            # (R, 9+D) state moves everything (record columns ride the
            # gather bitcast to f32 — a pure permutation).
            depth = jnp.sum((rec_orig != -2).astype(jnp.int32), axis=0)
            key = (max_depth - depth) * R + jnp.arange(R, dtype=jnp.int32)
            (key_s,) = jax.lax.sort([key], dimension=0, num_keys=1)
            perm = key_s % R
            stacked = jnp.concatenate(
                [o, d, gflat,
                 jax.lax.bitcast_convert_type(
                     rec_orig.T, jnp.float32)], axis=1)       # (R, 9+D)
            rows = jnp.take(stacked, perm, axis=0)
            o, d, gflat = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
            rec_orig = jax.lax.bitcast_convert_type(
                rows[:, 9:], jnp.int32).T                     # (D, R)
        idxs, events = _rec_to_path(rec_orig)
        skip = (perm is not None) if skip_dead is None else skip_dead

        def chunk_grads(args):
            o_c, d_c, idx_c, ev_c, g_c = args
            _, vjp = jax.vjp(
                lambda sph, oo, dd: replay_paths(sph, oo, dd, idx_c,
                                                 ev_c, gather=gather,
                                                 remat=remat,
                                                 skip_dead=skip),
                spheres, o_c, d_c)
            return vjp(g_c)

        if bwd_chunks <= 1:
            gs, go, gd = chunk_grads((o, d, idxs, events, gflat))
        else:
            ck = -(-R // bwd_chunks)
            pad = ck * bwd_chunks - R

            def pad0(x, axis, fill=0):
                if pad == 0:
                    return x
                widths = [(0, 0)] * x.ndim
                widths[axis] = (0, pad)
                return jnp.pad(x, widths, constant_values=fill)

            # padding rays must be INERT: a zero direction drives 0/0 NaNs
            # through the replay VJP (a = d.d = 0), and events=0 would read
            # as EV_BOUNCE — pad with unit dirs and EV_INACTIVE instead
            oo = pad0(o, 0).reshape(bwd_chunks, ck, 3)
            dd = jnp.where(
                jnp.arange(ck * bwd_chunks)[:, None] < R,
                pad0(d, 0), jnp.float32(1.0)).reshape(bwd_chunks, ck, 3)
            ii = pad0(idxs, 1).reshape(max_depth, bwd_chunks, ck) \
                .transpose(1, 0, 2)
            ee = pad0(events, 1, fill=EV_INACTIVE) \
                .reshape(max_depth, bwd_chunks, ck).transpose(1, 0, 2)
            gg = pad0(gflat, 0).reshape(bwd_chunks, ck, 3)
            gs_all, go_all, gd_all = jax.lax.map(
                chunk_grads, (oo, dd, ii, ee, gg))
            gs = jax.tree.map(lambda x: jnp.sum(x, axis=0), gs_all)
            go = go_all.reshape(-1, 3)[:R]
            gd = gd_all.reshape(-1, 3)[:R]

        if perm is not None:
            # unsort the ray cotangents (sphere grads are ray-sums and
            # need no unsorting); inverse perm via one int scatter
            inv = jnp.zeros((R,), jnp.int32).at[perm].set(
                jnp.arange(R, dtype=jnp.int32))
            god = jnp.take(jnp.concatenate([go, gd], axis=1), inv, axis=0)
            go, gd = god[:, 0:3], god[:, 3:6]

        # pull the ray cotangents back to the camera
        _, vjp_rays = jax.vjp(lambda c: primary_rays(c, width, height), cam)
        (gcam,) = vjp_rays((go, gd))
        return gs, gcam

    render_diff.defvjp(fwd, bwd)
    return render_diff


def _make_render_pallas_diff_kernel(width, height, max_depth, tile,
                                    interpret, block=None,
                                    schedule=None, sort_prefix=None,
                                    cluster_width=None):
    """backward="pallas": fused TPU backward replay.

    Forward: megakernel record_pay mode (colours + per-bounce winner
    slot AND winner sphere fields).  Backward: the hand-reversed Pallas
    kernel (pallas_replay_bwd) emits per-bounce sphere cotangents and
    per-ray (origin, direction) cotangents; slot-space cotangents are
    segment-summed onto the sphere table with the exact bf16 one-hot
    dots (diff_render._split3) batched over depth, then scattered from
    Morton-slot order back to the caller's sphere order.

    With ``phase1_depth=p`` both directions are split into a shallow
    segment (all rays, primary layout) and a deep segment (compacted
    survivors): the forward is render_pallas_record_twophase, the
    backward first replays the deep segment from the sorted boundary
    state (emitting the 9-row cotangent carry), scatters the carry back
    to primary ray order, and replays the shallow segment seeded with
    it.  Gradients are exact for the same reason the single-segment
    replay is: per-ray arithmetic is identical, segment hand-off is just
    the chain rule at the depth-p cut.
    """
    from .diff_render import _oh_of, _split3
    from .pallas_replay_bwd import replay_bwd_pallas

    if block is not None:
        bh, bw = block
        assert bh * bw == tile, (block, tile)
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        blk_params = jnp.asarray(
            [wp // bw, bw, bh, 1.0 / (wp // bw)], jnp.float32)
    else:
        blk_params = jnp.zeros((4,), jnp.float32)

    def _params(cam):
        return jnp.concatenate([
            cam.llc, cam.horizontal, cam.vertical, cam.origin,
            jnp.zeros((4,), jnp.float32),
            jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                        jnp.float32),
            blk_params,
        ]).astype(jnp.float32)

    def _gflat(g, Rp):
        """Image cotangent -> (Rp, 3) in the forward's tile-ray order."""
        R = width * height
        if block is not None:
            gpad = jnp.pad(g, ((0, hp - height), (0, wp - width), (0, 0)))
            return (gpad.reshape(hp // bh, bh, wp // bw, bw, 3)
                    .transpose(0, 2, 1, 3, 4).reshape(Rp, 3))
        return jnp.pad(g.reshape(-1, 3), ((0, Rp - R), (0, 0)))

    def _rows16(arr3, nt, carry9=None):
        """(Rp, 3) cotangent (+ optional 9 x (Rp,) carry) -> (nt, 16, T)."""
        rows = [arr3.T.reshape(3, nt, tile).transpose(1, 0, 2)]
        if carry9 is not None:
            rows.append(jnp.stack(carry9, axis=0)
                        .reshape(9, nt, tile).transpose(1, 0, 2))
            rows.append(jnp.zeros((nt, 4, tile), jnp.float32))
        else:
            rows.append(jnp.zeros((nt, 13, tile), jnp.float32))
        return jnp.concatenate(rows, axis=1)

    def _segments_to_tab(segs, S, C, cam, interpret):
        """Run the replay kernel over each (rec, pay, gcot, state, bt, D)
        segment and reduce all slot cotangents to tab_slot (S, 7).
        Returns (tab_slot, [cotray per segment])."""
        cotrays = []
        if C <= 256:
            # in-kernel slot reduction (the (rays, slots) one-hot never
            # leaves VMEM), chunked by 8 clusters so the masked stack
            # stays small (irreg C=79: the XLA one-hot fallback measured
            # 547 ms fwd+bwd; in-kernel ~90).  The grid-accumulated
            # (C*24, 128) table is ~7.5 KB/cluster of VMEM, so the
            # in-kernel path now covers C <= 256 (leaf-64 irreg: C=157);
            # beyond that fall back to the batched XLA segment-sum
            acc = None
            for rec_s, pay_s, gcot_s, state_s, bt, D_s in segs:
                tblred, cotray = replay_bwd_pallas(
                    _params(cam), rec_s, pay_s, gcot_s, tile=tile,
                    max_depth=D_s, interpret=interpret,
                    reduce_clusters=C, block_tiled=bt,
                    state_rows=state_s)
                cotrays.append(cotray)
                t = tblred.sum(axis=0)                       # (C*24, 128)
                acc = t if acc is None else acc + t
            t = acc.reshape(C, 3, 8, 128).sum(axis=1)        # (C, 8, 128)
            tab_slot = t.transpose(0, 2, 1).reshape(S, 8)[:, :7]
            return tab_slot, cotrays

        tab_slot = jnp.zeros((S, 7), jnp.float32)
        for rec_s, pay_s, gcot_s, state_s, bt, D_s in segs:
            cotsph, cotray = replay_bwd_pallas(
                _params(cam), rec_s, pay_s, gcot_s, tile=tile,
                max_depth=D_s, interpret=interpret, block_tiled=bt,
                state_rows=state_s)
            cotrays.append(cotray)
            Rp_s = rec_s.shape[0] * tile

            # batched slot-space segment-sum: one exact bf16 one-hot dot
            # per depth (padding rays carry zero cotangent; non-bounce
            # steps were written as zeros by the kernel, so clipped ids
            # are harmless)
            ids = rec_s.transpose(1, 0, 2).reshape(D_s, Rp_s)
            cots = cotsph.transpose(1, 2, 0, 3).reshape(D_s, 8, Rp_s)

            def body(tab, xs):
                ids_d, cot_d = xs
                oh = _oh_of(jnp.clip(ids_d, 0, None), S)     # (Rp, S)
                c3 = jax.lax.dot_general(
                    oh, jnp.concatenate(_split3(cot_d[:7].T), axis=1),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (S, 21)
                return (tab + (c3[:, 0:7] + c3[:, 7:14] + c3[:, 14:21]),
                        None)

            tab_slot, _ = jax.lax.scan(body, tab_slot, (ids, cots))
        return tab_slot, cotrays

    @jax.custom_vjp
    def render_diff(spheres: Spheres, cam: Camera):
        scene = build_pallas_scene(spheres, cluster_width=cluster_width)
        if schedule:
            colours, _ = render_pallas_record_twophase(
                scene, cam, width, height, max_depth=max_depth,
                schedule=schedule, tile=tile,
                interpret=interpret, block=block,
                sort_prefix=sort_prefix)
        else:
            colours, _ = render_pallas_record(
                scene, cam, width, height, max_depth=max_depth, tile=tile,
                interpret=interpret, block=block)
        return colours

    def fwd(spheres, cam):
        scene = build_pallas_scene(spheres, cluster_width=cluster_width)
        if schedule:
            colours, aux = render_pallas_record_twophase(
                scene, cam, width, height, max_depth=max_depth,
                schedule=schedule, tile=tile,
                interpret=interpret, block=block,
                sort_prefix=sort_prefix)
            return colours, (spheres, cam, aux, scene.order)
        colours, _, rec_raw, pay = render_pallas_record(
            scene, cam, width, height, max_depth=max_depth, tile=tile,
            interpret=interpret, with_pay=True, block=block)
        return colours, (spheres, cam, (rec_raw, pay), scene.order)

    def bwd(res, g):
        spheres, cam, fwd_res, order = res
        n = spheres.center.shape[0]
        R = width * height
        S = order.size
        C = S // 128

        if schedule:
            aux = fwd_res
            nt = aux["recs"][0].shape[0]
            Rp = nt * tile
            m = len(aux["poskeys"])            # boundaries
            depths = list(schedule) + [max_depth - sum(schedule)]
            gflat = _gflat(g, Rp)
            # segments deep-to-shallow; the 9-row cotangent carry crosses
            # each boundary via ONE fused multi-operand sort on the
            # boundary's position key (low bits = position in the
            # previous segment's order, so the ascending key-sort IS the
            # inverse permutation; dead lanes emit exact-zero carries —
            # measured ~10 ms vs ~40+ for the equivalent scatter)
            # resolve the forward's static boundary sort prefixes (the
            # suffix beyond a prefix carried an IDENTITY permutation, so
            # the carry hand-off inverts with the same prefix)
            pref_rows = [None] * m
            if sort_prefix is not None:
                fr = list(sort_prefix)[:m]
                pref_rows = [None if (f is None or f >= 1.0)
                             else max(tile, int(Rp * f) // tile * tile)
                             for f in fr] + [None] * (m - len(fr))
            # image cotangent in each segment's ray order, chained through
            # the boundary permutations (g_{k+1} = g_k[pos_k]; the poskey
            # low bits are the sort's source positions).  A prefixed
            # boundary's suffix permutation is the identity, so its gather
            # shrinks to the prefix — vs a full (Rp, 3) gather per
            # boundary (~7 ms each at 1e6 rays) for gflat[idxs[k-1]].
            gseg = [gflat]
            for j in range(m):
                pos_j = aux["poskeys"][j] & ((1 << 30) - 1)
                B = pref_rows[j]
                if B is not None and 0 < B < Rp:
                    head = jnp.take(gseg[-1], pos_j[:B], axis=0)
                    gseg.append(jnp.concatenate([head, gseg[-1][B:]],
                                                axis=0))
                else:
                    gseg.append(jnp.take(gseg[-1], pos_j, axis=0))
            tab_slot = None
            carry9 = None
            for k in range(m, -1, -1):
                gk = gseg[k]
                segs = [(aux["recs"][k], aux["pays"][k],
                         _rows16(gk, nt, carry9),
                         None if k == 0 else aux["states16"][k - 1],
                         k == 0 and block is not None, depths[k])]
                tab_k, (carry16,) = _segments_to_tab(segs, S, C, cam,
                                                     interpret)
                tab_slot = tab_k if tab_slot is None else tab_slot + tab_k
                if k > 0:
                    pos_prev = aux["poskeys"][k - 1] & ((1 << 30) - 1)
                    carr_rows = [carry16[:, r, :].reshape(Rp)
                                 for r in range(9)]
                    B = pref_rows[k - 1]
                    if B is not None and 0 < B < Rp:
                        head = jax.lax.sort(
                            [pos_prev[:B]] + [r[:B] for r in carr_rows],
                            dimension=0, num_keys=1)
                        carry9 = [jnp.concatenate([h, r[B:]])
                                  for h, r in zip(head[1:], carr_rows)]
                    else:
                        unsorted = jax.lax.sort([pos_prev] + carr_rows,
                                                dimension=0, num_keys=1)
                        carry9 = unsorted[1:]
                else:
                    cotray = carry16
        else:
            rec_raw, pay = fwd_res
            nt = rec_raw.shape[0]
            Rp = nt * tile
            gcot_rows = _rows16(_gflat(g, Rp), nt)
            tab_slot, (cotray,) = _segments_to_tab(
                [(rec_raw, pay, gcot_rows, None, block is not None,
                  max_depth)], S, C, cam, interpret)
        ordv = order.reshape(-1)
        tgt = jnp.where(ordv >= 0, ordv, n)                   # pad -> dropped
        tab = jnp.zeros((n + 1, 7), jnp.float32).at[tgt].add(tab_slot)[:n]
        gs = Spheres(center=tab[:, 0:3], radius=tab[:, 3],
                     color=tab[:, 4:7])

        if block is not None:
            # unscramble block tiles back to row-major ray order
            rays6 = (cotray[:, 0:6, :].transpose(1, 0, 2)
                     .reshape(6, hp // bh, wp // bw, bh, bw)
                     .transpose(0, 1, 3, 2, 4).reshape(6, hp, wp)
                     [:, :height, :width].reshape(6, R))
            go = rays6[0:3].T
            gd = rays6[3:6].T
        else:
            go = cotray[:, 0:3, :].transpose(0, 2, 1).reshape(-1, 3)[:R]
            gd = cotray[:, 3:6, :].transpose(0, 2, 1).reshape(-1, 3)[:R]
        _, vjp_rays = jax.vjp(lambda c: primary_rays(c, width, height), cam)
        (gcam,) = vjp_rays((go, gd))
        return gs, gcam

    render_diff.defvjp(fwd, bwd)
    return render_diff
