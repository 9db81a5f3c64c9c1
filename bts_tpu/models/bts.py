"""The BTS model: encoder + dense-ASPP decoder + multi-scale LPG heads.

Reference parity: ``bts.py :: BtsModel`` (SURVEY.md §2.3, §3.4 — the shape
contract).  Forward:

    image (B, H, W, 3)  [NHWC, ImageNet-normalized]
    encoder -> skips h2, h4, h8, h16 and bottleneck h32
    dense_features = ReLU(h32)
    upconv5 -> H/16, BN, cat skip16, conv5
    upconv4 -> H/8,  BN, cat skip8,  conv4, BN
    dense ASPP at H/8: rates 3,6,12,18,24, densely concatenated
    reduc8x8 -> plane -> LPG 8x8 -> depth8 (B,H,W), /max_depth
    upconv3 -> H/4, BN, cat [skip4, depth8 ds x1/4], conv3
    reduc4x4 -> LPG 4x4 -> depth4, /max_depth
    upconv2 -> H/2, BN, cat [skip2, depth4 ds x1/2], conv2
    reduc2x2 -> LPG 2x2 -> depth2, /max_depth
    upconv1 -> H, reduc1x1 (sigmoid direct depth),
    cat [upconv1, depth1x1, depth2, depth4, depth8], conv1
    final_depth = max_depth * sigmoid(conv3x3 -> 1ch)

Returns (depth_8x8_scaled, depth_4x4_scaled, depth_2x2_scaled, depth_1x1,
final_depth), all (B, H, W, 1) — the same 4 aux outputs + final the
reference exposes for its TensorBoard LPG visualizations and bts_test.py
``--save_lpg`` flag.

KITTI focal scaling: the reference multiplies the final depth by
focal/715.0873 when training KITTI with mixed focal lengths; we expose the
same hook via the ``focal`` argument.

TPU design notes:
- the whole forward is a static-shape NHWC conv pipeline -> XLA tiles every
  conv onto the MXU; concats fuse into consumers;
- LPG heads run through bts_tpu.ops.lpg (Pallas-fused on TPU, f32 division);
- compute dtype is configurable (bf16 for training); BN and the LPG/plane
  math stay f32.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from bts_tpu.config import resolved_encoder_pad as _resolved_encoder_pad
from bts_tpu.models.encoders import build_encoder, encoder_channels
from bts_tpu.models.layers import AtrousConv, BatchNorm, ConvBlock, Reduction1x1, UpConv
from bts_tpu.ops.lpg import lpg_scaled_from_raw, lpg_strided, plane_from_spherical

KITTI_FOCAL = 715.0873


def _tail_ok(fused_tail: str, train: bool, shape) -> bool:
    """Static dispatch for the fused Pallas decoder tail (ops.tail_pallas).

    MEASURED AND REJECTED for production ("auto" resolves to the literal
    path): on the v5e at the flagship 352x1216 shape the kernel runs
    14.7 ms vs 3.4 ms for the literal XLA tail — the narrow column tiles
    that bound Mosaic's compile time also starve the MXU (K=32/N=32 tap
    matmuls), while XLA lowers the same convs as large implicit GEMMs.
    See PERFORMANCE.md "Tried and rejected".  ``always`` keeps the kernel
    reachable as the reproduction harness (inference-only — it has no VJP
    — and never inside a spatially sharded program, where its row halos
    would cross shard boundaries)."""
    if fused_tail != "always" or train:
        return False
    from bts_tpu.ops.tail_pallas import tail_supported

    if not tail_supported(shape):
        raise ValueError(
            f"fused_tail='always' unsupported for decoder tail shape {shape}"
        )
    return True


class BtsDecoder(nn.Module):
    max_depth: float = 80.0
    num_features: int = 512
    dtype: Any = jnp.float32
    use_pallas: str = "auto"
    # fused lhs-dilated upsample-conv (layers._DilatedUpConv); False keeps
    # the literal upsample->conv two-op form (equivalence tests / fallback)
    fused_upconv: bool = True
    # UpConv gradient lowering: "literal" (GSPMD-proven, required under
    # spatial sharding) | "dilated" (AD of the lhs-dilated conv — no
    # full-res intermediate in the backward; unsharded/pure-DP only).
    # See layers._DilatedUpConv.
    upconv_bwd: str = "literal"
    # EXPERIMENTAL (perf measurement only, scripts/exp_lanepad.py): zero-pad
    # the 1-channel LPG guidance maps to this many lanes before each decoder
    # concat (targets the measured ~21% relayout-copy tax of the b1 forward).
    # CHANGES THE PARAM TREE (conv cin grows) — never enable on checkpoints.
    lane_pad: int = 0
    # Fused Pallas decoder tail (ops.tail_pallas): one kernel for
    # upconv1 + reduction_1x1 head + concat1 + iconv1 + final conv, phase-
    # separated, no full-res HBM intermediates.  auto | always | never;
    # "auto" resolves to the literal path — the kernel measured 4.3x
    # SLOWER than the XLA tail on the v5e (see _tail_ok) — and "always"
    # keeps it reachable as the reproduction harness.  The param tree is
    # identical either way (the literal modules own the weights; the
    # kernel reads them), so checkpoints are unaffected.
    fused_tail: str = "auto"

    @nn.compact
    def __call__(self, feats, train: bool = False, focal: Optional[jnp.ndarray] = None):
        skip2, skip4, skip8, skip16, bottleneck = feats
        nf = self.num_features
        dt = self.dtype
        use_tail = (
            not self.is_initializing()
            and self.lane_pad <= 1
            and _tail_ok(
                self.fused_tail,
                train,
                (skip2.shape[0], skip2.shape[1], skip2.shape[2], nf // 8),
            )
        )

        def padmap(m):
            if self.lane_pad <= 1:
                return m
            return jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, self.lane_pad - 1)))

        up = lambda f: UpConv(f, dtype=dt, fused=self.fused_upconv, bwd=self.upconv_bwd)
        dense_features = nn.relu(bottleneck)
        upconv5 = up(nf)(dense_features)  # H/16
        upconv5 = BatchNorm(dtype=dt)(upconv5, train)
        concat5 = jnp.concatenate([upconv5, skip16], axis=-1)
        iconv5 = ConvBlock(nf, dtype=dt)(concat5)

        upconv4 = up(nf // 2)(iconv5)  # H/8
        upconv4 = BatchNorm(dtype=dt)(upconv4, train)
        concat4 = jnp.concatenate([upconv4, skip8], axis=-1)
        iconv4 = ConvBlock(nf // 2, dtype=dt)(concat4)
        iconv4 = BatchNorm(dtype=dt)(iconv4, train)

        # dense ASPP (SURVEY.md §2.6): each cell sees the concat of all
        # previous outputs (dense connectivity), rates 3/6/12/18/24.
        daspp_3 = AtrousConv(nf // 4, 3, apply_bn_first=False, dtype=dt)(iconv4, train)
        concat4_2 = jnp.concatenate([concat4, daspp_3], axis=-1)
        daspp_6 = AtrousConv(nf // 4, 6, dtype=dt)(concat4_2, train)
        concat4_3 = jnp.concatenate([concat4_2, daspp_6], axis=-1)
        daspp_12 = AtrousConv(nf // 4, 12, dtype=dt)(concat4_3, train)
        concat4_4 = jnp.concatenate([concat4_3, daspp_12], axis=-1)
        daspp_18 = AtrousConv(nf // 4, 18, dtype=dt)(concat4_4, train)
        concat4_5 = jnp.concatenate([concat4_4, daspp_18], axis=-1)
        daspp_24 = AtrousConv(nf // 4, 24, dtype=dt)(concat4_5, train)
        concat4_daspp = jnp.concatenate(
            [iconv4, daspp_3, daspp_6, daspp_12, daspp_18, daspp_24], axis=-1
        )
        daspp_feat = ConvBlock(nf // 4, dtype=dt)(concat4_daspp)

        # LPG head at 1/8: the fused Pallas head consumes the RAW 3-channel
        # reduction output (spherical transform + /max_depth inside the
        # kernel); plane8 is still formed in XLA for the tiny strided
        # guidance map below (it fuses into the producing 1x1 conv)
        reduc8 = Reduction1x1(nf // 4, dtype=dt)(daspp_feat)
        plane8 = plane_from_spherical(reduc8, self.max_depth)
        if not use_tail:
            depth_8x8_scaled = lpg_scaled_from_raw(reduc8, 8, self.max_depth, self.use_pallas)[..., None]
        # 1/4-res guidance map: evaluate the plane eq at strided pixels
        # directly (== downsample_nearest(depth_8x8_scaled, 4), without the
        # full-res gather/relayout; see ops.lpg.lpg_strided)
        depth_8x8_ds = (lpg_strided(plane8, 8, 4) / self.max_depth)[..., None].astype(dt)

        upconv3 = up(nf // 4)(daspp_feat)  # H/4
        upconv3 = BatchNorm(dtype=dt)(upconv3, train)
        concat3 = jnp.concatenate([upconv3, skip4, padmap(depth_8x8_ds)], axis=-1)
        iconv3 = ConvBlock(nf // 4, dtype=dt)(concat3)

        # LPG head at 1/4
        reduc4 = Reduction1x1(nf // 8, dtype=dt)(iconv3)
        plane4 = plane_from_spherical(reduc4, self.max_depth)
        if not use_tail:
            depth_4x4_scaled = lpg_scaled_from_raw(reduc4, 4, self.max_depth, self.use_pallas)[..., None]
        depth_4x4_ds = (lpg_strided(plane4, 4, 2) / self.max_depth)[..., None].astype(dt)

        upconv2 = up(nf // 8)(iconv3)  # H/2
        upconv2 = BatchNorm(dtype=dt)(upconv2, train)
        concat2 = jnp.concatenate([upconv2, skip2, padmap(depth_4x4_ds)], axis=-1)
        iconv2 = ConvBlock(nf // 8, dtype=dt)(concat2)

        # LPG head at 1/2 (plane2 has no strided consumer; XLA drops it on
        # the fused path)
        reduc2 = Reduction1x1(nf // 16, dtype=dt)(iconv2)

        if use_tail:
            # Fused Pallas tail (ops.tail_pallas): the three guidance maps
            # are produced PHASE-SPLIT straight from the raw reduction
            # outputs (identical f32 math to lpg_fused), the whole
            # upconv1 -> d1x1 -> concat1 -> iconv1 -> final chain runs in
            # one kernel, and the full-res maps below are re-interleaved
            # from the phases — XLA dead-code-eliminates any the caller
            # ignores.  The literal tail modules are not constructed on
            # this path; their params (created by the init/train path) are
            # read directly, so the parameter tree is identical either way.
            from bts_tpu.ops.tail_pallas import (
                fused_tail as _run_tail,
                interleave2x2,
                lpg_phase_planes,
            )

            d8ph = lpg_phase_planes(reduc8, 8)
            d4ph = lpg_phase_planes(reduc4, 4)
            d2ph = lpg_phase_planes(reduc2, 2)
            p = self.variables["params"]
            fin_ph, d1ph = _run_tail(
                iconv2.astype(jnp.bfloat16),
                d2ph,
                d4ph,
                d8ph,
                {
                    "up": p["UpConv_4"]["ConvBlock_0"]["Conv_0"],
                    "r1": p["Reduction1x1_3"]["Conv_0"],
                    "r2": p["Reduction1x1_3"]["Conv_1"],
                    "r3": p["Reduction1x1_3"]["Conv_2"],
                    "i1": p["ConvBlock_5"]["Conv_0"],
                    "f": p["ConvBlock_6"]["Conv_0"],
                },
            )
            depth_8x8_scaled = interleave2x2(d8ph)[..., None]
            depth_4x4_scaled = interleave2x2(d4ph)[..., None]
            depth_2x2_scaled = interleave2x2(d2ph)[..., None]
            depth_1x1 = interleave2x2(d1ph)[..., None]
            final_depth = self.max_depth * interleave2x2(fin_ph)[..., None]
        else:
            depth_2x2_scaled = lpg_scaled_from_raw(reduc2, 2, self.max_depth, self.use_pallas)[..., None]
            upconv1 = up(nf // 16)(iconv2)  # H
            depth_1x1 = Reduction1x1(nf // 32, is_final=True, dtype=dt)(upconv1)
            depth_1x1 = nn.sigmoid(depth_1x1.astype(jnp.float32))
            concat1 = jnp.concatenate(
                [
                    upconv1,
                    padmap(depth_1x1.astype(dt)),
                    padmap(depth_2x2_scaled.astype(dt)),
                    padmap(depth_4x4_scaled.astype(dt)),
                    padmap(depth_8x8_scaled.astype(dt)),
                ],
                axis=-1,
            )
            iconv1 = ConvBlock(nf // 16, dtype=dt)(concat1)
            logits = ConvBlock(1, act=None, dtype=dt)(iconv1)
            final_depth = self.max_depth * nn.sigmoid(logits.astype(jnp.float32))
        if focal is not None:
            # scale by focal/715.0873 (KITTI focal normalization, reference
            # bts.py forward); samples with no focal recorded (0.0) pass through
            f = focal.reshape(-1, 1, 1, 1).astype(jnp.float32)
            final_depth = final_depth * jnp.where(f > 0, f / KITTI_FOCAL, 1.0)
        return (
            depth_8x8_scaled.astype(jnp.float32),
            depth_4x4_scaled.astype(jnp.float32),
            depth_2x2_scaled.astype(jnp.float32),
            depth_1x1,
            final_depth,
        )


class BtsModel(nn.Module):
    """Full BTS network: encoder + decoder (reference ``bts.py`` top level)."""

    encoder_name: str = "densenet161_bts"
    max_depth: float = 80.0
    num_features: int = 512
    dtype: Any = jnp.float32
    use_pallas: str = "auto"
    remat: bool = False  # rematerialize encoder blocks (large-batch training)
    remat_policy: str = "layer"  # layer | block | convs (DenseNet granularity)
    fused_upconv: bool = True  # see BtsDecoder.fused_upconv
    upconv_bwd: str = "literal"  # see BtsDecoder.upconv_bwd
    lane_pad: int = 0  # EXPERIMENTAL — see BtsDecoder.lane_pad
    fused_tail: str = "auto"  # see BtsDecoder.fused_tail
    # stride-2 window alignment in the encoder: "same" (TF geometry, the
    # default) | "torch" (torchvision geometry — REQUIRED for torch
    # --pretrained_model weights to be spatially aligned; layers.pad2)
    encoder_pad: str = "same"

    @nn.compact
    def __call__(self, image, train: bool = False, focal: Optional[jnp.ndarray] = None):
        feats = build_encoder(
            self.encoder_name,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            pad_style=self.encoder_pad,
        )(image.astype(self.dtype), train)
        return BtsDecoder(
            max_depth=self.max_depth,
            num_features=self.num_features,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            fused_upconv=self.fused_upconv,
            upconv_bwd=self.upconv_bwd,
            lane_pad=self.lane_pad,
            fused_tail=self.fused_tail,
        )(feats, train, focal)


def create_model(cfg) -> BtsModel:
    """Build a BtsModel from a Config (bts_tpu.config.Config)."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]
    if cfg.upconv_bwd == "dilated" and (cfg.spatial_shards > 1 or cfg.spatial_shards_w > 1):
        raise ValueError(
            "--upconv_bwd dilated is incompatible with --spatial_shards[_w]: GSPMD "
            "mis-partitions the lhs-dilated conv backward under H/W sharding "
            "(measured O(1) gradient error; models/layers.py::_up2x_conv)"
        )
    return BtsModel(
        encoder_name=cfg.encoder,
        max_depth=cfg.max_depth,
        num_features=cfg.bts_size,
        dtype=dtype,
        use_pallas=cfg.use_pallas,
        remat=cfg.remat,
        remat_policy=cfg.remat_policy,
        # GSPMD mis-partitions the dilated-conv backward when H/W are
        # sharded, so the AD-derived (materialization-free) backward is
        # only safe without --spatial_shards[_w]; batch sharding never
        # splits H/W (layers._DilatedUpConv).
        upconv_bwd=(
            ("literal" if (cfg.spatial_shards > 1 or cfg.spatial_shards_w > 1) else "dilated")
            if cfg.upconv_bwd == "auto"
            else cfg.upconv_bwd
        ),
        # the fused tail's row halos cannot cross spatial-shard boundaries;
        # force the literal (GSPMD-proven) path under --spatial_shards[_w]
        fused_tail="never"
        if (cfg.spatial_shards > 1 or cfg.spatial_shards_w > 1)
        else cfg.fused_tail,
        # "auto": torch-pretrained encoders need torchvision's stride-2
        # window alignment (a TF-SAME encoder applies those weights one
        # input pixel off at every downsampling stage — test_torch_oracle);
        # scratch training keeps the TF geometry the parity tests pin.
        # Restore-side drivers adopt a trained run's geometry from its
        # config sidecar first (config.adopt_sidecar_geometry).
        encoder_pad=_resolved_encoder_pad(cfg),
    )


def expected_encoder_channels(name: str):
    return encoder_channels(name)
