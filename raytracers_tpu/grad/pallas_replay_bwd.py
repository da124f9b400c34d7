"""Pallas backward-replay kernel: the TPU-native gradient path.

The XLA replay (diff_render.replay_paths) runs the 50-step shading chain
as a whole-batch scan: each step is ~a dozen unfused HBM-bound kernels
plus an (R, N) one-hot gather, and `lax.cond` dead-step skipping was
measured to COST rather than save (docs/PERF_NOTES.md).  This kernel
instead fuses the entire per-ray backward chain into one Pallas program
per ray tile, mirroring the forward megakernel's layout discipline
((1, T) state rows, rays on lanes):

  * the forward megakernel (record_pay mode) emits, per bounce, the
    winner sphere's fields (pay, (D, 8, T) per tile) and the event
    record (slot / -1 miss / -2 inactive / -3 absorb) — so the backward
    needs NO gather at all;
  * pass 1 recomputes the forward chain (o, d, light per bounce) into
    VMEM scratch — attenuation/positions are cheap to recompute and
    far cheaper than storing them from the forward render;
  * pass 2 walks bounces deepest-first carrying the ray cotangents
    (cot_o, cot_d, cot_light), hand-reversing the shading chain
    (quadratic -> hit point -> normal -> reflection -> attenuation,
    futhark/ray.fut:76-117 semantics), seeding at the terminal miss
    step from the image cotangent through the sky gradient
    (ray.fut:141-148), and emitting per-bounce sphere cotangents
    (d/dcenter, d/dradius, d/dcolour) as (D, 8, T) outputs.

The recompute mirrors the MEGAKERNEL's arithmetic bit-for-bit — same
reciprocal-multiply roots, same `lax.rsqrt` direction normalisation,
same key-floored widened window `floor_key(t_search) + 1` and
unconditional far-root fallback (render/pallas_kernel.py bounce_body) —
NOT geometry.sphere_hit_t's formulas.  That guarantees the replayed
chain IS the path the forward actually took (``emit_fwd=True`` exposes
the replayed colours; tests assert bit-equality with the forward
image), so the frozen-discrete gradient is evaluated on the true
primal path.  f32 mirror cascades are chaotic (a 1-ulp primal
difference is ~1e-2 of gradient by depth 3, ~100% by depth 6 —
measured), so replaying a *different* ulp-level formula family would
inject noise of that size into deep-bounce gradients.

Per-bounce sphere cotangents are reduced to the sphere table OUTSIDE the
kernel with the same exact bf16 one-hot dots as the XLA replay
(diff_render._split3 machinery) — MXU segment-sum, batched over depth.

Gradient semantics are identical to replay_paths: discrete path choices
(which sphere, which root, scatter accept) are treated as constants, so
this is the exact gradient away from visibility discontinuities.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import SCENE_EPSILON, T_MAX, T_MIN
from ..render.pallas_kernel import _KEY_MASK

_BIG = float(T_MAX)            # python float: a jnp constant would be captured
_SKY_K = (0.5, 0.7, 1.0)       # bg gradient endpoint (ray.fut:141-148)


def _quad(ox, oy, oz, dx, dy, dz, cx, cy, cz, rad):
    """Forward quadratic + two-phase root selection, BIT-IDENTICAL to the
    megakernel's visit + bounce_body re-intersection (far_root=True):
    search t with far-root fallback over (eps, BIG), floor it to the
    packed-key precision (the forward's best_t had its 7 lane bits
    cleared), widen by +1 (ray.fut:84-85), then near-else-far.  Returns
    (t2, ok0 — near-root-selected mask — and intermediates)."""
    ocx = ox - cx
    ocy = oy - cy
    ocz = oz - cz
    a = dx * dx + dy * dy + dz * dz
    b = ocx * dx + ocy * dy + ocz * dz
    c2 = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b * b - a * c2
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
    inv_a = 1.0 / a
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    # search phase (pallas_kernel.py visit): a-scaled m = a*t candidates
    # with far-root fallback, no upper bound, miss -> BIG.  SELECTOR
    # ONLY — window bounds carry no gradient (they only pick the
    # branch), so the search value has no cotangent.
    eps = jnp.float32(SCENE_EPSILON)
    epsa = eps * a
    m0 = -b - sq
    use0 = m0 > epsa
    ms = jnp.where(use0, m0, -b + sq)
    mv = jnp.where(pos & (ms > epsa), ms, _BIG)
    # the forward's best m came from the packed (m | lane) key with the
    # 7 lane bits cleared — reproduce the floor, then unscale, exactly
    best_m = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(mv, jnp.int32) & jnp.int32(_KEY_MASK),
        jnp.float32)
    # widened re-intersection window (T_MIN, best_t + 1)  (ray.fut:84-85)
    w_hi = best_m * inv_a + 1.0
    ok0 = (t0 < w_hi) & (t0 > jnp.float32(T_MIN))
    t2 = jnp.where(ok0, t0, t1)
    return (t2, ok0, ocx, ocy, ocz, a, b, c2, sq, inv_a)


def _replay_bwd_kernel(params_ref, rec_ref, pay_ref, gcot_ref, *refs,
                       tile: int, max_depth: int, emit_fwd: bool,
                       reduce_clusters: int, block_tiled: bool,
                       state_in: bool):
    refs = list(refs)
    stin_ref = refs.pop(0) if state_in else None  # (1, 16, T) rows 0-8
    cot_ref = refs.pop(0)       # (1,D,8,T) cotsph OR (1,C*24,128) table
    cotray_ref = refs.pop(0)
    fwd_ref = refs.pop(0) if emit_fwd else None
    st_ref = refs.pop(0)
    T = tile
    D = max_depth
    width = params_ref[16]
    height = params_ref[17]
    inv_w = params_ref[18]
    inv_h = params_ref[19]
    one = jnp.ones((1, T), jnp.float32)

    if state_in:
        # ---- segment continuation: (o, d, light) at segment start ----
        (ox0, oy0, oz0, dx0, dy0, dz0, l0r, l0g, l0b) = (
            stin_ref[0, pl.ds(r, 1), :] for r in range(9))
    else:
        # ---- primary rays (same tile->pixel math as the megakernel) ----
        pid = pl.program_id(0)
        lid = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(
            jnp.float32)
        if block_tiled:
            bpr = params_ref[20]
            bw = params_ref[21]
            bh = params_ref[22]
            inv_bpr = params_ref[23]
            pidf = jnp.float32(pid)
            tr = jnp.floor(pidf * inv_bpr)
            tc = pidf - tr * bpr
            ov = (tc >= bpr).astype(jnp.float32)
            un = (tc < 0.0).astype(jnp.float32)
            tc = tc - ov * bpr + un * bpr
            tr = tr + ov - un
            inv_bw = 1.0 / bw
            by = jnp.floor(lid * inv_bw)
            bx = lid - by * bw
            ov = (bx >= bw).astype(jnp.float32)
            un = (bx < 0.0).astype(jnp.float32)
            bx = bx - ov * bw + un * bw
            by = by + ov - un
            i = tc * bw + bx
            j = tr * bh + by
        else:
            ids = pid * T + lid
            j = jnp.floor(ids * inv_w)
            i = ids - j * width
            ov = (i >= width).astype(jnp.float32)
            un = (i < 0.0).astype(jnp.float32)
            i = i - ov * width + un * width
            j = j + ov - un
        u = i * inv_w
        v = (height - j) * inv_h
        dx0 = (params_ref[0] + u * params_ref[3] + v * params_ref[6]
               - params_ref[9])
        dy0 = (params_ref[1] + u * params_ref[4] + v * params_ref[7]
               - params_ref[10])
        dz0 = (params_ref[2] + u * params_ref[5] + v * params_ref[8]
               - params_ref[11])
        ox0 = jnp.full((1, T), params_ref[9])
        oy0 = jnp.full((1, T), params_ref[10])
        oz0 = jnp.full((1, T), params_ref[11])
        l0r = l0g = l0b = one

    def rec_at(k):
        return rec_ref[0, pl.ds(k, 1), :]                     # (1, T) int32

    def pay_at(k, row):
        return pay_ref[0, pl.ds(k, 1), pl.ds(row, 1), :].reshape(1, T)

    def st_store(k, row, val):
        st_ref[pl.ds(k * 9 + row, 1), :] = val

    def st_at(k, row):
        return st_ref[pl.ds(k * 9 + row, 1), :]

    # ---- pass 1: forward chain, storing (o, d, light) per bounce ----
    def fwd_step(k, carry):
        ox, oy, oz, dx, dy, dz, lr, lg, lb, rr, rg, rb = carry
        for row, val in enumerate((ox, oy, oz, dx, dy, dz, lr, lg, lb)):
            st_store(k, row, val)
        rec = rec_at(k)
        bounce = rec >= 0
        cx = pay_at(k, 0)
        cy = pay_at(k, 1)
        cz = pay_at(k, 2)
        rad = pay_at(k, 3)
        cr = pay_at(k, 4)
        cg = pay_at(k, 5)
        cb = pay_at(k, 6)
        (t2, _, _, _, _, a, _, _, _, _) = _quad(
            ox, oy, oz, dx, dy, dz, cx, cy, cz, rad)
        px = ox + t2 * dx
        py = oy + t2 * dy
        pz = oz + t2 * dz
        inv_r = 1.0 / rad
        nx = (px - cx) * inv_r
        ny = (py - cy) * inv_r
        nz = (pz - cz) * inv_r
        inv_len = jax.lax.rsqrt(a)        # the megakernel's inv_dn
        ux = dx * inv_len
        uy = dy * inv_len
        uz = dz * inv_len
        q = ux * nx + uy * ny + uz * nz
        rx = ux - 2.0 * q * nx
        ry = uy - 2.0 * q * ny
        rz = uz - 2.0 * q * nz
        if emit_fwd:
            miss = rec == -1
            tsky = 0.5 * (uy + 1.0)
            rr = jnp.where(miss, lr * ((1.0 - tsky) + tsky * _SKY_K[0]), rr)
            rg = jnp.where(miss, lg * ((1.0 - tsky) + tsky * _SKY_K[1]), rg)
            rb = jnp.where(miss, lb * ((1.0 - tsky) + tsky * _SKY_K[2]), rb)
        ox = jnp.where(bounce, px, ox)
        oy = jnp.where(bounce, py, oy)
        oz = jnp.where(bounce, pz, oz)
        dx = jnp.where(bounce, rx, dx)
        dy = jnp.where(bounce, ry, dy)
        dz = jnp.where(bounce, rz, dz)
        lr = jnp.where(bounce, lr * cr, lr)
        lg = jnp.where(bounce, lg * cg, lg)
        lb = jnp.where(bounce, lb * cb, lb)
        return (ox, oy, oz, dx, dy, dz, lr, lg, lb, rr, rg, rb)

    zero = jnp.zeros((1, T), jnp.float32)
    gr = gcot_ref[0, pl.ds(0, 1), :]
    gg = gcot_ref[0, pl.ds(1, 1), :]
    gb = gcot_ref[0, pl.ds(2, 1), :]
    # zero outputs up front: in segmented (state_in) mode an all-dead
    # tile (compaction packs dead rays into a contiguous suffix) skips
    # both passes entirely and must still emit zero cotangents
    if reduce_clusters:
        # the slot table ACCUMULATES across the sequential grid (constant
        # output index_map): zero it only on the first tile
        @pl.when(pl.program_id(0) == 0)
        def _zero_tab():
            cot_ref[0, :, :] = jnp.zeros((reduce_clusters * 24, 128),
                                         jnp.float32)
    elif state_in:
        cot_ref[0, :, :, :] = jnp.zeros((D, 8, T), jnp.float32)
    if state_in:
        cotray_ref[0, :, :] = jnp.zeros((16, T), jnp.float32)

    # ---- pass 2: deepest-first cotangent sweep ----
    def bwd_step(jj, carry):
        k = (D - 1) - jj
        (cox, coy, coz, cdx, cdy, cdz, clr, clg, clb) = carry
        rec = rec_at(k)
        bounce = rec >= 0
        miss = rec == -1
        absorb = rec == -3
        ox = st_at(k, 0)
        oy = st_at(k, 1)
        oz = st_at(k, 2)
        dx = st_at(k, 3)
        dy = st_at(k, 4)
        dz = st_at(k, 5)
        lr = st_at(k, 6)
        lg = st_at(k, 7)
        lb = st_at(k, 8)
        cx = pay_at(k, 0)
        cy = pay_at(k, 1)
        cz = pay_at(k, 2)
        rad = pay_at(k, 3)
        cr = pay_at(k, 4)
        cg = pay_at(k, 5)
        cb_ = pay_at(k, 6)

        # ---------- bounce chain (candidates; masked at the end) ------
        (t2, ok0, ocx, ocy, ocz, a, b, c2, sq,
         inv_a) = _quad(ox, oy, oz, dx, dy, dz, cx, cy, cz, rad)
        px = ox + t2 * dx
        py = oy + t2 * dy
        pz = oz + t2 * dz
        inv_r = 1.0 / rad
        nx = (px - cx) * inv_r
        ny = (py - cy) * inv_r
        nz = (pz - cz) * inv_r
        inv_len = jax.lax.rsqrt(a)
        ux = dx * inv_len
        uy = dy * inv_len
        uz = dz * inv_len
        q = ux * nx + uy * ny + uz * nz

        # light' = light * col
        ccolr = lr * clr
        ccolg = lg * clg
        ccolb = lb * clb
        nlr = cr * clr
        nlg = cg * clg
        nlb = cb_ * clb
        # d' = refl(u, n) = u - 2 q n ; o' = p
        cpx = cox
        cpy = coy
        cpz = coz
        crx = cdx
        cry = cdy
        crz = cdz
        ndotcr = nx * crx + ny * cry + nz * crz
        cux = crx - 2.0 * nx * ndotcr
        cuy = cry - 2.0 * ny * ndotcr
        cuz = crz - 2.0 * nz * ndotcr
        cnx = -2.0 * (ux * ndotcr + q * crx)
        cny = -2.0 * (uy * ndotcr + q * cry)
        cnz = -2.0 * (uz * ndotcr + q * crz)
        # n = (p - c) / r
        cpx = cpx + cnx * inv_r
        cpy = cpy + cny * inv_r
        cpz = cpz + cnz * inv_r
        ccx = -cnx * inv_r
        ccy = -cny * inv_r
        ccz = -cnz * inv_r
        crad = -(nx * cnx + ny * cny + nz * cnz) * inv_r
        # u = d / |d|
        udotcu = ux * cux + uy * cuy + uz * cuz
        ndx = (cux - ux * udotcu) * inv_len
        ndy = (cuy - uy * udotcu) * inv_len
        ndz = (cuz - uz * udotcu) * inv_len
        # p = o + t2 d
        nox = cpx
        noy = cpy
        noz = cpz
        ndx = ndx + t2 * cpx
        ndy = ndy + t2 * cpy
        ndz = ndz + t2 * cpz
        ct2 = dx * cpx + dy * cpy + dz * cpz
        # t2 = (-b + s*sq) * inv_a   (s = -1 near root, +1 far root; at a
        # recorded bounce t2 is always one of the two real roots)
        s = jnp.where(ok0, -1.0, 1.0)
        cb2 = -inv_a * ct2
        csq = s * inv_a * ct2
        ca = -t2 * inv_a * ct2
        cdisc = csq * (0.5 / sq)
        cb2 = cb2 + 2.0 * b * cdisc
        ca = ca - c2 * cdisc
        cc2 = -a * cdisc
        # b = oc.d ; c2 = oc.oc - r^2 ; a = d.d ; oc = o - c
        cocx = cb2 * dx + 2.0 * cc2 * ocx
        cocy = cb2 * dy + 2.0 * cc2 * ocy
        cocz = cb2 * dz + 2.0 * cc2 * ocz
        ndx = ndx + cb2 * ocx + 2.0 * ca * dx
        ndy = ndy + cb2 * ocy + 2.0 * ca * dy
        ndz = ndz + cb2 * ocz + 2.0 * ca * dz
        crad = crad - 2.0 * rad * cc2
        nox = nox + cocx
        noy = noy + cocy
        noz = noz + cocz
        ccx = ccx - cocx
        ccy = ccy - cocy
        ccz = ccz - cocz

        # ---------- miss seeds (terminal step; carry arriving is 0) ----
        t_sky = 0.5 * (uy + 1.0)
        sky = [(1.0 - t_sky) + t_sky * k_c for k_c in _SKY_K]
        mlr = sky[0] * gr
        mlg = sky[1] * gg
        mlb = sky[2] * gb
        cot_t = (lr * gr * (_SKY_K[0] - 1.0)
                 + lg * gg * (_SKY_K[1] - 1.0)
                 + lb * gb * (_SKY_K[2] - 1.0))
        cuy_m = 0.5 * cot_t
        udotcu_m = uy * cuy_m
        mdx = (-ux * udotcu_m) * inv_len
        mdy = (cuy_m - uy * udotcu_m) * inv_len
        mdz = (-uz * udotcu_m) * inv_len

        # ---------- emit sphere cotangents for this step --------------
        zero = jnp.zeros((1, T), jnp.float32)
        if reduce_clusters:
            # in-kernel slot reduction: build the bounce-masked (8, T)
            # cotangent rows arithmetically (no (1,T)->(8,T) select_n
            # broadcast in Mosaic), split each f32 into 3 exact bf16
            # terms, mask per cluster, and accumulate the (C*24, 128)
            # table with ONE natural-layout NT MXU dot against the
            # winner-lane one-hot — the whole (rays x slots) segment-sum
            # never touches HBM
            C = reduce_clusters
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            cot8 = jnp.zeros((8, T), jnp.float32)
            for row, val in enumerate((ccx, ccy, ccz, crad,
                                       ccolr, ccolg, ccolb)):
                m = (row_ids == row).astype(jnp.float32)
                cot8 = cot8 + m * jnp.where(bounce, val, 0.0)
            hi = cot8.astype(jnp.bfloat16)
            r1 = cot8 - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            split24 = jnp.concatenate([hi, mid, lo], axis=0)   # (24, T)
            cidx = jax.lax.shift_right_arithmetic(rec, 7)      # (1, T)
            lane = rec & jnp.int32(127)
            lane_oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                       == lane).astype(jnp.bfloat16)           # (128, T)
            # accumulate in chunks of <= 8 clusters: the (cc*24, T)
            # masked stack stays under ~0.8 MB VMEM at any C, so this
            # in-kernel reduction scales to C = 128 (irreg's grad path
            # fell back to the XLA (Rp, C*128) one-hot segment-sum
            # before — measured 547 ms fwd+bwd vs ~90 here).  Each slot
            # row belongs to exactly one chunk, so chunked accumulation
            # is bit-identical to the single big dot.  Chunks with no
            # winner lane this step are SKIPPED (same gated-run pattern
            # as the forward's dynamic sweep): a tile-step's winners hit
            # few distinct clusters, so at irreg's C=79 most of the 10
            # chunk stacks+dots would reduce exact zeros — the ungated
            # version measured ~47 ms of replay kernels vs rgbbox's ~6
            # (tools/fwdbwd_breakdown.py --scene irreg --trace).
            chunk_of = jax.lax.shift_right_arithmetic(cidx, 3)  # (1, T)
            for c0 in range(0, C, 8):
                cc = min(8, C - c0)
                hit = jnp.sum((chunk_of == (c0 // 8)).astype(jnp.float32))

                @pl.when(hit > 0.0)
                def _chunk(c0=c0, cc=cc):
                    chunk = jnp.concatenate(
                        [split24 * (cidx == c).astype(jnp.bfloat16)
                         for c in range(c0, c0 + cc)], axis=0)  # (cc*24, T)
                    acc = jax.lax.dot_general(
                        chunk, lane_oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)     # (cc*24,128)
                    cot_ref[0, c0 * 24:(c0 + cc) * 24, :] = (
                        cot_ref[0, c0 * 24:(c0 + cc) * 24, :] + acc)
        else:
            for row, val in enumerate((ccx, ccy, ccz, crad,
                                       ccolr, ccolg, ccolb, zero)):
                out = jnp.where(bounce, val, 0.0) if row < 7 else val
                cot_ref[0, pl.ds(k, 1), pl.ds(row, 1), :] = out.reshape(
                    1, 1, T)

        # ---------- carry update --------------------------------------
        def sel(bv, mv, cv):
            return jnp.where(bounce, bv,
                             jnp.where(miss, mv,
                                       jnp.where(absorb, 0.0, cv)))

        return (sel(nox, 0.0, cox), sel(noy, 0.0, coy), sel(noz, 0.0, coz),
                sel(ndx, mdx, cdx), sel(ndy, mdy, cdy), sel(ndz, mdz, cdz),
                sel(nlr, mlr, clr), sel(nlg, mlg, clg), sel(nlb, mlb, clb))

    def _run_passes():
        fin = jax.lax.fori_loop(
            0, D, fwd_step,
            (ox0, oy0, oz0, dx0, dy0, dz0, l0r, l0g, l0b,
             zero, zero, zero))
        if emit_fwd:
            for row, val in enumerate((fin[9], fin[10], fin[11])):
                fwd_ref[0, pl.ds(row, 1), :] = val
            for row in range(3, 8):
                fwd_ref[0, pl.ds(row, 1), :] = zero
        # pass-2 carry seed: rows 3-11 of the cotangent input hold the
        # INCOMING carry (zero for a full path; the deeper segment's
        # boundary cotangents when this call is the shallow half of a
        # compacted two-segment replay)
        carry0 = tuple(gcot_ref[0, pl.ds(3 + r, 1), :] for r in range(9))
        (cox, coy, coz, cdx, cdy, cdz, clr_f, clg_f,
         clb_f) = jax.lax.fori_loop(0, D, bwd_step, carry0)

        if state_in:
            # emit the full 9-row boundary carry for the shallower segment
            for row, val in enumerate((cox, coy, coz, cdx, cdy, cdz,
                                       clr_f, clg_f, clb_f)):
                cotray_ref[0, pl.ds(row, 1), :] = val
        else:
            for row, val in enumerate((cox, coy, coz, cdx, cdy, cdz,
                                       zero, zero)):
                cotray_ref[0, pl.ds(row, 1), :] = val

    if state_in:
        # all-dead tiles (contiguous after compaction) skip both passes;
        # a ray inactive at step 0 of a continuation segment stays
        # inactive, so the step-0 record row decides for the whole tile
        rec0 = rec_ref[0, pl.ds(0, 1), :]
        alive = jnp.sum((rec0 != -2).astype(jnp.float32)) > 0.0
        pl.when(alive)(_run_passes)
    else:
        _run_passes()


def replay_bwd_pallas(params, rec_raw, pay, gcot_rows, *,
                      tile: int, max_depth: int, interpret: bool = False,
                      emit_fwd: bool = False,
                      reduce_clusters: int | None = None,
                      block_tiled: bool = False,
                      state_rows=None):
    """Run the backward-replay kernel.

    params: the megakernel SMEM params vector (camera + image geometry,
    scanline mode) — reuse the one built for the forward record render.
    rec_raw (num_tiles, D, T) int32, pay (num_tiles, D, 8, T) f32 from
    ``render_pallas_record(..., with_pay=True)``; gcot_rows
    (num_tiles, 16, T) f32 with the image cotangent in rows 0..2 and an
    optional incoming boundary carry (cot o/d/light of the NEXT
    segment's start state) in rows 3..11 — zeros for a whole-path
    replay.

    ``state_rows`` ((num_tiles, 16, T) f32, rows 0..8 = o/d/light at
    segment start) switches the kernel to segment-continuation mode: the
    primal chain replays from that state instead of regenerating primary
    rays, and cotray becomes the 9-row boundary carry
    (num_tiles, 16, T, rows 0..8) to feed the shallower segment's
    gcot rows 3..11 — the hand-off for compacted two-segment replays.

    Returns (cotsph, cotray (num_tiles, 8, T) with d/d(origin),
    d/d(direction) of each primary ray in rows 0..5).  cotsph is
    per-bounce (num_tiles, D, 8, T) — rows d/d(cx cy cz rad cr cg cb) —
    by default; with ``reduce_clusters=C`` the kernel instead
    segment-sums cotangents onto slots as it sweeps (exact 3-term bf16
    one-hot MXU dots entirely in VMEM; chunks with no winner lane are
    gated off — exact-zero contributions) and cotsph is ONE slot table
    (1, C*24, 128) accumulated across the sequential grid: 24 rows per
    cluster = the bf16 hi/mid/lo planes of the 8 fields, 128 lanes =
    sphere-in-cluster.  Sum the 3 planes to get the (S, 8) slot table —
    neither the (rays, slots) one-hot nor the per-tile tables ever
    touch HBM.
    With ``emit_fwd=True`` the last output (num_tiles, 8, T) carries the
    pass-1 replayed colours in rows 0..2 — they must BIT-MATCH the
    forward megakernel's image (tests/test_pallas_diff.py), proving the
    backward differentiates the true primal path.
    """
    num_tiles = rec_raw.shape[0]
    D = max_depth
    T = tile
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    kernel = functools.partial(_replay_bwd_kernel, tile=T, max_depth=D,
                               emit_fwd=emit_fwd,
                               reduce_clusters=reduce_clusters or 0,
                               block_tiled=block_tiled,
                               state_in=state_rows is not None)
    if reduce_clusters:
        # constant index_map: ONE (C*24, 128) table accumulated across
        # the sequential grid — the per-tile tables never round-trip
        # through HBM (at irreg's C=79 the per-tile output array was
        # (nt, 1896, 128) f32 ≈ 475 MB of write+read per segment)
        C = reduce_clusters
        out_specs = [vm((1, C * 24, 128), lambda i: (0, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((1, C * 24, 128),
                                          jnp.float32)]
    else:
        out_specs = [vm((1, D, 8, T), lambda i: (i, 0, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((num_tiles, D, 8, T),
                                          jnp.float32)]
    ray_rows = 16 if state_rows is not None else 8
    out_specs += [vm((1, ray_rows, T), lambda i: (i, 0, 0))]
    out_shape += [jax.ShapeDtypeStruct((num_tiles, ray_rows, T),
                                       jnp.float32)]
    if emit_fwd:
        out_specs.append(vm((1, 8, T), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((num_tiles, 8, T),
                                              jnp.float32))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                vm((1, D, T), lambda i: (i, 0, 0)),
                vm((1, D, 8, T), lambda i: (i, 0, 0, 0)),
                vm((1, 16, T), lambda i: (i, 0, 0))]
    args = [params, rec_raw, pay, gcot_rows]
    if state_rows is not None:
        in_specs.append(vm((1, 16, T), lambda i: (i, 0, 0)))
        args.append(state_rows)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((D * 9, T), jnp.float32)],
        interpret=interpret,
    )(*args)
