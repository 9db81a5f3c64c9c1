"""Fused full-resolution decoder tail: one Pallas kernel, phase-separated.

STATUS — MEASURED AND REJECTED for production (kept as the reproduction
harness behind ``fused_tail="always"``; PERFORMANCE.md "Tried and
rejected").  On the v5e at the flagship shape the kernel runs 14.7 ms vs
3.4 ms for the literal XLA tail it replaces: the fixed WB=128 column
tiles that keep Mosaic's (superlinear-in-width) compile time bounded also
pin every tap matmul at K<=32, N=32 — 1/16 of the MXU — while XLA lowers
the same convs as large implicit GEMMs.  The original full-width form was
worse still: its compile grew superlinearly until the compile helper was
OOM-killed at w2=608.  The numerics are good (closer to the f32 truth
than the literal bf16 path), so the kernel remains a correct, tested
harness and a record of WHY hand-written conv chains lose to XLA-TPU on
this architecture.

Why it was built: the round-3 profile of the b1 headline forward
(PERFORMANCE.md "Where the time goes") shows ~2.9 ms of the 10.62 ms
step in the full-res tail —
iconv1's conv fusion (0.49) + its concat-input relayout (0.39) + the final
3x3 conv (0.41) + 1-channel output copies (0.55) + the UpConv_4 ELU select
and relayout (0.47) + the Reduction1x1 chain fusions (~0.4) + the concat
itself (0.12).  Every one of those ops materializes a full-resolution
tensor in HBM, most with 1..32-channel minor dims that relayout terribly.

This kernel computes the ENTIRE tail (SURVEY.md §2.3 final stage,
bts.py:139-154)

    upconv1 = ELU(up2x_conv3x3(iconv2, 64->32))         # full res
    d1x1    = sigmoid(reduction_1x1 chain 32->16->8->1)  # is_final head
    concat1 = [upconv1, d1x1, d2, d4, d8]                # 36 ch
    iconv1  = ELU(conv3x3 36->32)
    final   = max_depth * sigmoid(conv3x3 32->1)

without writing ANY full-res intermediate to HBM, in the 2x2 PHASE domain:
full-res pixel (2u+py, 2v+pz) belongs to phase (py, pz), and

  up[2u+py, 2v+pz] = sum_{dy,dx in {0,1}}
      x[u+py-1+dy, v+pz-1+dx] * K4[py+2dy, pz+2dx]          (K4 = K (*) 1_2x2)
  conv3x3 out phase (qy,qz):
      sum_{dy,dx in {-1,0,1}} in_phase[(qy+dy)%2, (qz+dx)%2]
          [u+(qy+dy)//2, v+(qz+dx)//2] * K3[dy+1, dx+1]

(validated to 6e-5 f32 against the literal lax convs).  The nearest-2x
upsample therefore never exists even in VMEM, and all tensors keep a
>=32-lane channel dim until the final 1-channel planes, which leave the
kernel as dense (rows, cols) f32 phase planes.  Phase planes are
re-interleaved to full resolution by one XLA reshape-transpose per output
(DCE'd for outputs the caller does not use).

The LPG guidance maps d2/d4/d8 are consumed phase-split; `lpg_phase_planes`
below evaluates the plane equation per phase directly from the raw
reduction_1x1 output (same f32 math as ops.lpg_pallas.lpg_fused, so the
interleaved planes are bit-identical to the full-res kernel output).

Hardware constraints shaping the code (all verified on the v5e):
- DMA slice shapes must align to the (sublane, lane) tiling: lane dims a
  multiple of 128 at 128-aligned offsets, sublane windows a multiple of 8
  (f32; 16-row bf16 windows at 8-aligned offsets verified OK).  Inputs are
  therefore padded in XLA: iconv2 channels 64->128 and cols by 16 left,
  guidance planes' cols by 128 left (so every per-tile DMA offset is
  aligned by construction).  These pads are cheap dense copies that
  replace far more expensive relayouts.
- In-VMEM static slices at unaligned sublane/lane offsets are supported
  (halo taps slice at offsets 0..5); slice LENGTHS need no alignment.
- Grid tiles: MP=8 phase rows (16 full-res rows) x WB=128 phase cols per
  program.  Column tiling is what makes the kernel COMPILABLE: Mosaic's
  compile time for this unrolled body is superlinear in the vector width
  (measured: 137 s at 104 lanes, >10 min at 232, compile-helper OOM-kill
  at 616), so per-program widths must stay fixed as w2 grows.  Ragged
  widths are zero-padded to a WB multiple in XLA and masked in-kernel
  with absolute column positions; outputs are sliced back to w2.
- The four 1-channel guidance maps (d1x1 + d2/d4/d8) are packed ONCE per
  phase into an 8-lane scratch (offset-0 lane broadcasts x one-hot
  constants); each iconv1 tap is then 2 MXU matmuls (32-ch main + 8-ch
  maps) instead of 1 matmul + 4 scratch-realigned broadcasts — the
  packing removes ~300 Mosaic ops/program from the original form.

Inference only: training keeps the literal module path (this kernel has no
VJP), as does any spatially-sharded program (the halo would cross shard
boundaries; see BtsDecoder.fused_tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bts_tpu.ops.lpg_pallas import (
    _col_expander,
    _h_tile,
    _mm,
    _row_expander,
    _spherical,
    pallas_available,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

import bts_tpu.ops.lpg_pallas as _lpg_mod

MP = 8          # phase rows (half-res) per grid step -> 16 full-res rows
WB = 128        # phase cols per grid step (fixed vector width, see above)
_XWIN = 16      # iconv2 DMA window rows (MP//2 + halo 3 top/5 bottom pad)
_XCW = WB + 16  # iconv2 DMA window cols (WB + 8-col halo each side)
_MWIN = 16      # guidance-plane DMA window rows (MP + halo 2 top/6 bottom)
_MCW = WB + 256  # guidance-plane DMA window cols (128-aligned over-fetch)


def _interpret():
    return _lpg_mod._INTERPRET


# ---------------------------------------------------------------------------
# Phase-split LPG: raw reduction_1x1 output -> 4 phase planes of the scaled
# full-res map (depth/max_depth), each (h*k/2, w*k/2).
# ---------------------------------------------------------------------------


def _phase_lpg_kernel(x0_ref, x1_ref, x2_ref, out_ref, *, k: int):
    h, w = x0_ref.shape[1], x0_ref.shape[2]
    kk = k // 2
    n1, n2, n3, n4s = _spherical(
        x0_ref[0].astype(jnp.float32),
        x1_ref[0].astype(jnp.float32),
        x2_ref[0].astype(jnp.float32),
    )
    if kk > 1:
        r_mat = _row_expander(h, kk)
        c_mat = _col_expander(w, kk)
        n1, n2, n3, n4s = (
            _mm(_mm(r_mat, c.astype(jnp.float32)), c_mat) for c in (n1, n2, n3, n4s)
        )
    hh, ww = h * kk, w * kk
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    sr = (row_ids % kk).astype(jnp.float32)
    sc = (col_ids % kk).astype(jnp.float32)
    for py in (0, 1):
        v = (2.0 * sr + py - (k - 1) * 0.5) / k
        for pz in (0, 1):
            u = (2.0 * sc + pz - (k - 1) * 0.5) / k
            out_ref[0, 2 * py + pz] = n4s / (n1 * u + n2 * v + n3)


def _phase_lpg_call(x0, x1, x2, *, k: int):
    b, h, w = x0.shape
    kk = k // 2
    hb = _h_tile(h, w, k)
    in_spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0))
    out_spec = pl.BlockSpec((1, 4, hb * kk, w * kk), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        functools.partial(_phase_lpg_kernel, k=k),
        grid=(b, h // hb),
        in_specs=[in_spec] * 3,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, 4, h * kk, w * kk), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 4 * (h * kk * hb * w + h * kk * w * w * kk)
            + 8 * b * h * w * k * k,
            bytes_accessed=4 * (3 * b * h * w + b * h * w * k * k),
            transcendentals=7 * b * h * w,
        ),
    )(x0, x1, x2)


def lpg_phase_planes(raw3: jnp.ndarray, k: int) -> jnp.ndarray:
    """raw3 (B, h, w, 3) -> (B, 4, h*k/2, w*k/2) f32 phase planes of the
    scaled LPG map; phase q = 2*py + pz holds full-res pixels
    (2u+py, 2v+pz).  Interleaving the planes is bit-identical to
    ops.lpg_pallas.lpg_fused(raw3, k)."""
    r = raw3.astype(jnp.float32)
    return _phase_lpg_call(r[..., 0], r[..., 1], r[..., 2], k=k)


def interleave2x2(ph: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, Hh, Wh) phase planes -> (B, 2Hh, 2Wh) full resolution."""
    b, q, hh, wh = ph.shape
    assert q == 4
    return (
        ph.reshape(b, 2, 2, hh, wh)
        .transpose(0, 3, 1, 4, 2)
        .reshape(b, 2 * hh, 2 * wh)
    )


# ---------------------------------------------------------------------------
# The fused tail kernel.
# ---------------------------------------------------------------------------


def _elu(x):
    # nn.elu; computed in f32 and rounded back (Mosaic has no bf16 compare
    # or expm1 lowering) — differences vs the literal bf16 nn.elu are below
    # the bf16 rounding noise the parity tests already allow.
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf, jnp.exp(xf) - 1.0).astype(x.dtype)


def _tail_kernel(
    x_hbm, d2_hbm, d4_hbm, d8_hbm,
    k4_ref, bup_ref, wr1_ref, br1_ref, wr2_ref, br2_ref, wr3_ref, br3_ref,
    ki1_ref, km_ref, bi1_ref, kf_ref, bff_ref,
    final_ref, d1x1_ref,
    xs, m2s, m4s, m8s, mts, ups, d1s, mp4, i1s, accu, acci, sems,
    *, w2: int, hh: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    c = pl.program_id(2)
    c0 = c * WB  # absolute phase-col base of this tile
    # --- DMA input windows -------------------------------------------------
    # x: padded cols = 16 left; window [c0+8, c0+8+_XCW) in padded space =
    # real cols [c0-8, c0+WB+8) — offset 8-aligned, length a 16-multiple.
    # maps: padded cols = 128 left; lane window [c0, c0+_MCW) = real cols
    # [c0-128, c0+WB+128) — offset/length 128-aligned by construction.
    copies = [
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * MP, _XWIN), pl.ds(c0 + 8, _XCW)], xs, sems.at[0]
        ),
        pltpu.make_async_copy(
            d2_hbm.at[b, :, pl.ds(t * MP, _MWIN), pl.ds(c0, _MCW)], m2s, sems.at[1]
        ),
        pltpu.make_async_copy(
            d4_hbm.at[b, :, pl.ds(t * MP, _MWIN), pl.ds(c0, _MCW)], m4s, sems.at[2]
        ),
        pltpu.make_async_copy(
            d8_hbm.at[b, :, pl.ds(t * MP, _MWIN), pl.ds(c0, _MCW)], m8s, sems.at[3]
        ),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    # --- upconv1 phases + reduction head, phase-separated ------------------
    # up grid: rows u in [t*MP-2, t*MP+10) (12), cols v in [c0-4, c0+WB+4).
    # xs row for (u, py, dy) = u+py-1+dy - (t*MP-3) = i+py+dy  (offsets 0..2)
    # xs col for (v, pz, dx) = v+pz-1+dx - (c0-8)   = j+3+pz+dx (offsets 3..5)
    #
    # The phase/tap loops are deliberately UNROLLED python loops: Mosaic
    # requires dynamic sublane offsets to be provably 8-aligned, and every
    # halo tap slices at odd offsets — a lax.fori_loop form fails to
    # compile ("cannot statically prove that index ... is a multiple of 8").
    # Compile time stays bounded because every op is <= WB+8 lanes wide
    # regardless of w2; all accumulation goes through scratch REFS
    # (accu/acci) because Mosaic stack-allocates value chains (the
    # pure-value form requested 71 MiB of scoped vmem).
    wu = WB + 8
    # SAME-conv zero-padding semantics: positions outside the image must be
    # ZERO when consumed by the next conv's halo taps, but the phase grids
    # extend 2 rows / 4 cols beyond the tile (and bias+ELU of a zero input
    # is not zero) — mask with ABSOLUTE row/col positions (c0-relative cols
    # also mask the zero-padded ragged tail of the last column tile).
    up_row = jax.lax.broadcasted_iota(jnp.int32, (12, 1, 1), 0) + (t * MP - 2)
    up_rmask = (up_row >= 0) & (up_row < hh)
    up_col = jax.lax.broadcasted_iota(jnp.int32, (1, wu, 1), 1) + (c0 - 4)
    up_cmask = (up_col >= 0) & (up_col < w2)
    up_mask = up_rmask & up_cmask
    for py in (0, 1):
        for pz in (0, 1):
            q = 2 * py + pz
            accu[...] = jnp.zeros_like(accu)
            for dy in (0, 1):
                for dx in (0, 1):
                    sl = xs[pl.ds(py + dy, 12), pl.ds(3 + pz + dx, wu), :]
                    accu[...] = accu[...] + jax.lax.dot_general(
                        sl,
                        k4_ref[py + 2 * dy, pz + 2 * dx],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            y = jnp.where(
                up_mask,
                _elu(accu[...] + bup_ref[0].astype(jnp.float32)),
                0.0,
            )
            ups[q] = y
            # reduction_1x1 is_final chain: 32 -> 16 -> 8 -> 1, sigmoid f32
            r = _elu(
                jax.lax.dot_general(
                    y.astype(jnp.bfloat16), wr1_ref[...],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + br1_ref[0].astype(jnp.float32)
            )
            r = _elu(
                jax.lax.dot_general(
                    r.astype(jnp.bfloat16), wr2_ref[...],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + br2_ref[0].astype(jnp.float32)
            )
            logits = (
                r.astype(jnp.bfloat16).astype(jnp.float32)
                * wr3_ref[0].astype(jnp.float32)
            ).sum(-1) + br3_ref[0]
            d1s[q] = jnp.where(up_mask[..., 0], jax.nn.sigmoid(logits), 0.0)

    # --- pack the 4 guidance maps into 8 lanes, once per phase -------------
    # mp4[p, i, j, m] = map_m at up-grid position (row i, col j); lanes
    # 4..7 stay zero (matching km_ref's zero rows).  d1s reads at offset 0
    # broadcast directly; the DMA'd planes land at local col 124 = (c0-4) -
    # (c0-128), so they realign through the mts scratch first (Mosaic only
    # lowers the trailing-lane broadcast for offset-0 operands).
    def _onehot8(m):
        return (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2) == m
        ).astype(jnp.float32)

    for p in (0, 1, 2, 3):
        acc4 = jax.lax.broadcast_in_dim(
            d1s[p].astype(jnp.float32), (12, wu, 8), (0, 1)
        ) * _onehot8(0)
        for mref, m in ((m2s, 1), (m4s, 2), (m8s, 3)):
            mts[0:12, 0:wu] = mref[p, pl.ds(0, 12), pl.ds(124, wu)]
            acc4 = acc4 + jax.lax.broadcast_in_dim(
                mts[0:12, 0:wu], (12, wu, 8), (0, 1)
            ) * _onehot8(m)
        mp4[p] = acc4

    # --- iconv1 phases (3x3 on the full-res grid, 36 -> 32) ----------------
    # grid: rows w in [t*MP-1, t*MP+9) (10), cols v in [c0-2, c0+WB+2).
    # up/d1/mp4 row = w+ro - (t*MP-2) = i+1+ro (0..2); col = v+co - (c0-4)
    # = j+2+co (1..3).  Each tap: one 32-ch main matmul + one 8-ch packed
    # guidance matmul (km_ref rows 0..3 = ki1 rows 32..35, rows 4..7 zero).
    wi = WB + 4
    i1_row = jax.lax.broadcasted_iota(jnp.int32, (10, 1, 1), 0) + (t * MP - 1)
    i1_col = jax.lax.broadcasted_iota(jnp.int32, (1, wi, 1), 1) + (c0 - 2)
    i1_mask = (i1_row >= 0) & (i1_row < hh) & (i1_col >= 0) & (i1_col < w2)
    for qy in (0, 1):
        for qz in (0, 1):
            q = 2 * qy + qz
            acci[...] = jnp.zeros_like(acci)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    p = 2 * ((qy + dy) % 2) + (qz + dx) % 2
                    ro = (qy + dy) // 2
                    co = (qz + dx) // 2
                    sl = ups[p, pl.ds(1 + ro, 10), pl.ds(2 + co, wi), :].astype(
                        jnp.bfloat16
                    )
                    acci[...] = acci[...] + jax.lax.dot_general(
                        sl,
                        ki1_ref[dy + 1, dx + 1],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    slm = mp4[p, pl.ds(1 + ro, 10), pl.ds(2 + co, wi), :].astype(
                        jnp.bfloat16
                    )
                    acci[...] = acci[...] + jax.lax.dot_general(
                        slm,
                        km_ref[dy + 1, dx + 1],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            i1s[q] = jnp.where(
                i1_mask,
                _elu(acci[...] + bi1_ref[0].astype(jnp.float32)),
                0.0,
            )

    # --- final conv phases (3x3, 32 -> 1); emits sigmoid(logits), the
    # caller applies max_depth (and focal) outside -------------------------
    # grid: rows w in [t*MP, t*MP+8), cols v in [c0, c0+WB).
    # i1 row = w+ro - (t*MP-1) = i+1+ro (0..2); col = v+co - (c0-2) = j+2+co
    for qy in (0, 1):
        for qz in (0, 1):
            acc = jnp.zeros((MP, WB), jnp.float32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    p = 2 * ((qy + dy) % 2) + (qz + dx) % 2
                    ro = (qy + dy) // 2
                    co = (qz + dx) // 2
                    sl = i1s[p, pl.ds(1 + ro, MP), pl.ds(2 + co, WB), :]
                    acc = acc + (
                        sl.astype(jnp.bfloat16).astype(jnp.float32)
                        * kf_ref[3 * (dy + 1) + dx + 1].astype(jnp.float32)
                    ).sum(-1)
            logits = acc + bff_ref[0]
            q = 2 * qy + qz
            final_ref[0, q] = jax.nn.sigmoid(logits)
            # d1x1 output rows = w - (t*MP-2) = i+2; cols = v - (c0-4) = j+4
            d1x1_ref[0, q] = d1s[q, pl.ds(2, MP), pl.ds(4, WB)]


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def fused_tail(
    iconv2: jnp.ndarray,
    d2ph: jnp.ndarray,
    d4ph: jnp.ndarray,
    d8ph: jnp.ndarray,
    params: dict,
):
    """Run the fused tail.

    iconv2: (B, Hh, W2, 64) compute-dtype;  d{2,4,8}ph: (B, 4, Hh, W2) f32
    phase planes (from lpg_phase_planes).  params: flax param subtrees for
    UpConv_4/ConvBlock_0/Conv_0, Reduction1x1_3/Conv_{0,1,2},
    ConvBlock_5/Conv_0, ConvBlock_6/Conv_0 (f32 masters; cast here).

    Returns (final_sig_ph, d1x1_ph), each (B, 4, Hh, W2) f32 — phase planes
    of sigmoid(final logits) and of the depth_1x1 head.
    """
    b, hh, w2, cin = iconv2.shape
    assert cin == 64 and hh % MP == 0, (iconv2.shape,)
    w2p = _round_up(w2, WB)          # column tiles of WB phase cols each
    xcols = 16 + w2p + 16            # last x DMA window ends at w2p+24
    mcols = 128 + w2p + 128          # last map DMA window ends exactly here

    bf = jnp.bfloat16
    x = iconv2.astype(bf)
    xpad = jnp.pad(x, ((0, 0), (3, 5), (16, xcols - w2 - 16), (0, 64)))
    mpads = [
        jnp.pad(m, ((0, 0), (0, 0), (2, 6), (128, mcols - w2 - 128)))
        for m in (d2ph, d4ph, d8ph)
    ]

    # K4 = K (*) ones(2,2), cin zero-padded 64 -> 128 (DMA lane alignment)
    k_up = params["up"]["kernel"].astype(jnp.float32)
    k4 = jnp.zeros((4, 4) + k_up.shape[2:], jnp.float32)
    for u in (0, 1):
        for v in (0, 1):
            k4 = k4.at[u : u + 3, v : v + 3].add(k_up)
    k4 = jnp.pad(k4.astype(bf), ((0, 0), (0, 0), (0, 64), (0, 0)))

    # iconv1 kernel split: rows 0..31 (upconv channels) for the main matmul,
    # rows 32..35 (guidance maps) zero-padded to 8 for the packed matmul.
    ki1_full = params["i1"]["kernel"].astype(bf)
    ki1_main = ki1_full[:, :, :32, :]
    ki1_maps = jnp.pad(ki1_full[:, :, 32:36, :], ((0, 0), (0, 0), (0, 4), (0, 0)))

    def as2d(v):
        return v.reshape(1, -1).astype(bf)

    args = (
        xpad, *mpads,
        k4, as2d(params["up"]["bias"]),
        params["r1"]["kernel"].reshape(32, 16).astype(bf), as2d(params["r1"]["bias"]),
        params["r2"]["kernel"].reshape(16, 8).astype(bf), as2d(params["r2"]["bias"]),
        params["r3"]["kernel"].reshape(8, 1).T.astype(bf),
        params["r3"]["bias"].reshape(1).astype(jnp.float32),
        ki1_main, ki1_maps, as2d(params["i1"]["bias"]),
        params["f"]["kernel"].reshape(9, 32, 1)[..., 0].astype(bf),
        params["f"]["bias"].reshape(1).astype(jnp.float32),
    )
    nt = hh // MP
    nc = w2p // WB
    vspec = lambda shp: pl.BlockSpec(shp, lambda b_, t_, c_: (0,) * len(shp))
    out_spec = pl.BlockSpec((1, 4, MP, WB), lambda b_, t_, c_: (b_, 0, t_, c_))
    out_shape = jax.ShapeDtypeStruct((b, 4, hh, w2p), jnp.float32)
    kernel = functools.partial(_tail_kernel, w2=w2, hh=hh)
    final_ph, d1x1_ph = pl.pallas_call(
        kernel,
        grid=(b, nt, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [
            vspec((4, 4, 128, 32)), vspec((1, 32)),
            vspec((32, 16)), vspec((1, 16)),
            vspec((16, 8)), vspec((1, 8)),
            vspec((1, 8)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vspec((3, 3, 32, 32)), vspec((3, 3, 8, 32)), vspec((1, 32)),
            vspec((9, 32)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        scratch_shapes=[
            pltpu.VMEM((_XWIN, _XCW, 128), jnp.bfloat16),
            pltpu.VMEM((4, _MWIN, _MCW), jnp.float32),
            pltpu.VMEM((4, _MWIN, _MCW), jnp.float32),
            pltpu.VMEM((4, _MWIN, _MCW), jnp.float32),
            pltpu.VMEM((16, _MCW), jnp.float32),
            pltpu.VMEM((4, 12, WB + 8, 32), jnp.float32),    # up phases
            pltpu.VMEM((4, 12, WB + 8), jnp.float32),        # d1x1 phases
            pltpu.VMEM((4, 12, WB + 8, 8), jnp.float32),     # packed maps
            pltpu.VMEM((4, 10, WB + 4, 32), jnp.float32),    # iconv1 phases
            pltpu.VMEM((12, WB + 8, 32), jnp.float32),       # up accumulator
            pltpu.VMEM((10, WB + 4, 32), jnp.float32),       # iconv1 accum
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            # Mosaic stack-allocates transients of the unrolled tap sums;
            # the per-tile live set is ~3 MiB but leave stack headroom
            # (v5e has 128 MiB VMEM).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hh * w2 * (16 * 128 * 32 + 9 * 32 * 32 + 32 * 16 + 16 * 8)
            * 4 // 4,
            bytes_accessed=2 * b * hh * w2 * (2 * 128 + 3 * 4) + 8 * b * hh * w2 * 4,
            transcendentals=b * 4 * hh * w2 * 3,
        ),
    )(*args)
    return final_ph[..., :w2], d1x1_ph[..., :w2]


def tail_supported(iconv2_shape) -> bool:
    """Static check: shapes the kernel's tiling supports (cin=64 means
    bts_size=512, the flagship config).  Width is unbounded: the kernel
    grids over fixed WB-col tiles, so VMEM use and compile time are
    width-independent (ragged widths are padded and masked)."""
    b, hh, w2, cin = iconv2_shape
    return cin == 64 and hh % MP == 0 and w2 >= 32 and w2 % 8 == 0
