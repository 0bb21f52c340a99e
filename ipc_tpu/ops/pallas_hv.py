"""Pallas TPU kernel: gather-free per-tet Hessian-vector product.

The matrix-free PCG's inner loop multiplies (T,12,12) per-tet blocks by
gathered vertex values. At 100K tets the XLA row-gather `v[tets]` costs
~5-6 cycles/row (measured 2.3 ms per PCG iteration on a v5e) — the single
largest cost at scale. This kernel removes the gather entirely:

  * tets are sorted by min vertex id at mesh build (locality) and packed
    into GREEDY blocks of up to B tets whose vertices fit in a WINDOW of
    WR rows of a 128-lane component-major packing of v — blocks split
    early at locality jumps (e.g. scene-component boundaries), short
    blocks pad with zero-Hessian tets;
  * per grid step the kernel DMAs the (3,WR,128) window (double-buffered
    across steps; dynamic offsets only ever on the ROW dimension — the
    only DMA form this Mosaic version compiles);
  * "gathers" via one-hot MXU contractions at HIGHEST precision (exact
    for 0/1 selection): a (128,B) lane-one-hot matmul + a (WR,B) row-mask
    reduction pick each corner's component values — the systolic array
    does the indexing;
  * the 12x12 block matvec runs in a transposed (12,12,B) layout so every
    elementwise op is full-lane wide.

The vertex accumulation of the per-corner rows stays outside
(ops/scatter.make_gather_sum over the padded block-order tet ids).

Callers fall back to the jnp gather path off-TPU, in f64, or when the
mesh's vertex ordering gives oversized windows (plan.ok False).
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["plan_hv_blocks", "make_hv_rows"]

_LANE = 128


class HvPlan:
    def __init__(self, ok, **kw):
        self.ok = ok
        self.__dict__.update(kw)


def plan_hv_blocks(tets_np, n_verts, block=1024, max_wr=48):
    """Greedy block/window planning (host, once per mesh).

    tets must be sorted by min vertex id (mesh.build_mesh does this).
    Blocks close when the next tet would push the window past max_wr rows
    or the block past `block` tets. Returns ok=False when blocking would
    degenerate (more than 2x the ideal block count — pathological vertex
    ordering; callers then use the jnp path)."""
    tets_np = np.asarray(tets_np, np.int64)
    T = len(tets_np)
    tmin = tets_np.min(axis=1) // _LANE
    tmax = tets_np.max(axis=1) // _LANE
    starts = [0]
    lo, hi = tmin[0], tmax[0]
    for t in range(1, T):
        nlo = min(lo, tmin[t])
        nhi = max(hi, tmax[t])
        if (t - starts[-1]) >= block or (nhi - nlo + 1) > max_wr:
            starts.append(t)
            lo, hi = tmin[t], tmax[t]
        else:
            lo, hi = nlo, nhi
    NB = len(starts)
    if NB > max(2, 2 * ((T + block - 1) // block)):
        return HvPlan(False)
    T_pad = NB * block
    blocks = np.zeros((NB, block, 4), np.int64)
    r0 = np.zeros(NB, np.int64)
    bounds = starts + [T]
    for i in range(NB):
        s, e = bounds[i], bounds[i + 1]
        blocks[i, : e - s] = tets_np[s:e]
        r0[i] = tets_np[s:e].min() // _LANE
        blocks[i, e - s:] = r0[i] * _LANE  # pads point into the window
    WR = int(np.ceil(int((blocks.reshape(NB, -1).max(axis=1) // _LANE
                          - r0 + 1).max()) / 8) * 8)
    WR = min(WR, ((max_wr + 7) // 8) * 8)
    VR = int(np.ceil((n_verts + 1) / _LANE))
    VR = max(VR, int(r0.max() + WR))
    local = blocks - (r0 * _LANE)[:, None, None]
    # block-order tet id list for the caller's gather-sum table: padding
    # slots route to a SINK vertex row (index n_verts, dropped after the
    # sum) so they never inflate any real vertex's multiplicity
    fill = np.zeros((NB, block), np.int64)
    ids_pad = np.full((NB, block, 4), n_verts, np.int64)
    for i in range(NB):
        s, e = bounds[i], bounds[i + 1]
        fill[i, : e - s] = np.arange(s, e)
        fill[i, e - s:] = -1  # padding marker
        ids_pad[i, : e - s] = tets_np[s:e]
    return HvPlan(
        True, T=T, NB=NB, B=block, T_pad=T_pad, WR=WR, VR=VR,
        bounds=bounds,
        src=fill.reshape(-1),  # (T_pad,) source tet index or -1
        ids_pad=ids_pad.reshape(-1, 4),
        r0=jnp.asarray(r0.astype(np.int32)),
        tl_row=jnp.asarray((local // _LANE).astype(np.int32)),
        tl_lane=jnp.asarray((local % _LANE).astype(np.int32)),
    )


def _make_kernel(plan):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, WR, NB = plan.B, plan.WR, plan.NB
    HI = jax.lax.Precision.HIGHEST

    def body(r0_ref, tlr_ref, tll_ref, Ht_ref, v_hbm, o_ref, vwin, sem):
        b = pl.program_id(0)

        def dma(slot, blk):
            return pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(r0_ref[blk], WR), :],
                vwin.at[slot], sem.at[slot])

        @pl.when(b == 0)
        def _():
            dma(0, 0).start()

        @pl.when(b + 1 < NB)
        def _():
            dma((b + 1) % 2, b + 1).start()

        dma(b % 2, b).wait()
        vw = vwin[b % 2].reshape(3 * WR, _LANE)
        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE, B), 0)
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (WR, B), 0)
        rows = []
        for k in range(4):
            lane_oh = (iota_lane == tll_ref[0, :, k][None, :]).astype(
                jnp.float32)
            Z = jnp.dot(vw, lane_oh, preferred_element_type=jnp.float32,
                        precision=HI)
            row_m = (iota_row == tlr_ref[0, :, k][None, :]).astype(jnp.float32)
            for c in range(3):
                rows.append(jnp.sum(Z[c * WR:(c + 1) * WR] * row_m, axis=0))
        V12T = jnp.stack(rows, axis=0)  # (12,B), row 3k+c
        o_ref[0] = jnp.sum(Ht_ref[0] * V12T[None, :, :], axis=1)

    body.__name__ = "tet_hv_window_kernel"
    return pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, B, 4), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, B, 4), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, 12, 12, B), lambda i, s: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 12, B), lambda i, s: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((2, 3, WR, _LANE), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NB, 12, B), jnp.float32),
    )


def make_hv_rows(plan):
    """Returns (prep_H, hv_rows).

    prep_H(Hel (T,12,12)) -> Ht (NB,12,12,B)  [once per Newton iteration;
    pads block remainders with zeros so padding slots contribute nothing]
    hv_rows(Ht, v (V,3)) -> (T_pad*4, 3) per-corner rows matching
    plan.ids_pad for the gather-sum table.
    """
    kernel = _make_kernel(plan)
    NB, Bb, T_pad, VR = plan.NB, plan.B, plan.T_pad, plan.VR
    bounds = plan.bounds

    def prep_H(Hel):
        # static per-block slices + zero pads (a [src] row-gather here is
        # ~10x slower on TPU); XLA turns this into plain copies
        Hel = Hel.astype(jnp.float32)
        zero = jnp.zeros((1, 12, 12), jnp.float32)
        parts = []
        for i in range(NB):
            s, e = bounds[i], bounds[i + 1]
            parts.append(Hel[s:e])
            if e - s < Bb:
                parts.append(jnp.broadcast_to(zero, (Bb - (e - s), 12, 12)))
        Hp = jnp.concatenate(parts, axis=0)
        return jnp.transpose(Hp.reshape(NB, Bb, 12, 12), (0, 2, 3, 1))

    def hv_rows(Ht, v):
        vp = jnp.zeros((3, VR * _LANE), jnp.float32)
        vp = vp.at[:, : v.shape[0]].set(v.T.astype(jnp.float32))
        out = kernel(plan.r0, plan.tl_row, plan.tl_lane, Ht,
                     vp.reshape(3, VR, _LANE))
        # (NB,12,B) -> rows (T_pad*4, 3): hv[bB+b', k, c] = out[b, 3k+c, b']
        hv = jnp.transpose(out, (0, 2, 1)).reshape(T_pad, 4, 3)
        return hv.reshape(-1, 3)

    return prep_H, hv_rows
