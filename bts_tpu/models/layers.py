"""Decoder building blocks (flax.linen, NHWC, bf16-compute / f32-params).

Reference counterparts (SURVEY.md §2.3/§2.6/§2.7 — ``bts.py`` custom Keras
layers ``upconv``, ``atrous_conv``, ``reduction_1x1``): re-expressed as linen
modules with TF-style SAME padding so XLA tiles the convs onto the MXU.

Conventions:
- every module takes ``dtype`` (compute) and keeps params in f32;
- BatchNorm uses eps 1.1e-5 / momentum .99 (the reference lineage's
  torch-momentum 0.01) and runs in f32 (BN statistics in bf16 drift);
- activations: ELU inside the decoder, ReLU inside the daspp cells,
  matching the reference lineage.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bts_tpu.ops.resize import upsample_nearest_2x

Dtype = Any


def pad2(kernel: int, style: str):
    """Padding for a stride-2 conv/pool under the given geometry convention.

    ``"same"`` — TF SAME (the TF-reference convention): for even inputs a
    k×k/2 window pads ``(k//2 - 1, k//2)`` per axis.  ``"torch"`` — the
    torchvision convention: symmetric explicit ``k//2`` both sides.  The two
    produce equal output SIZES but windows shifted by one input pixel, so
    torch-pretrained weights are only geometrically aligned under "torch"
    (verified against torch.nn.functional.conv2d: SAME differs O(1), explicit
    symmetric matches exactly — tests/test_torch_oracle.py).  Stride-1 SAME
    is symmetric already, so only stride-2 sites take this knob.
    """
    if style == "same":
        return "SAME"
    if style != "torch":
        raise ValueError(f"pad_style must be 'same' or 'torch', got {style!r}")
    p = kernel // 2
    return ((p, p), (p, p))


class ConvBlock(nn.Module):
    """3x3 (or kxk) SAME conv + ELU, the decoder's basic fusion block."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: Optional[Callable] = nn.elu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return self.act(x) if self.act is not None else x


class BatchNorm(nn.Module):
    """f32 BatchNorm with reference-lineage hyperparams."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        orig_dtype = x.dtype
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1.1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return x.astype(orig_dtype)


def _up2x_conv_literal(x, k):
    """The literal composition: nearest-2x upsample then SAME 3x3 conv.
    ``k`` is the f32 master kernel; compute runs in x's dtype (the same
    cast placement as nn.Conv with dtype=compute, param_dtype=f32)."""
    up = upsample_nearest_2x(x)
    return jax.lax.conv_general_dilated(
        up, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _up2x_conv_dilated(x, k):
    """conv3x3_SAME(up2x(x), K) as ONE lhs-dilated conv.

    Identity: nearest-2x upsample == zero-dilation (lhs_dilation=2)
    convolved with ones(2,2), so by associativity

        conv3x3_SAME(up2x(x), K) == conv(x, K (*) ones(2,2),
                                         lhs_dilation=2, padding=(2,2))

    with the 4x4 kernel K''[a,b] = sum_{u,v in {0,1}} K[a-u, b-v] (verified
    exact in f64 over all paddings; only ((2,2),(2,2)) aligns).

    Plain (AD-differentiable) form: JAX's derived VJP stays in the dilated
    domain — dx is a stride-2 conv of the cotangent, dK a conv of the
    lhs-dilated input with the cotangent — so the full-resolution upsampled
    tensor is never materialized in the backward either.  Only safe when
    the program is NOT spatially sharded (see _up2x_conv below).
    """
    kp = jnp.zeros((4, 4) + k.shape[2:], jnp.float32)
    for u in (0, 1):
        for v in (0, 1):
            kp = kp.at[u : u + 3, v : v + 3].add(k.astype(jnp.float32))
    return jax.lax.conv_general_dilated(
        x,
        kp.astype(x.dtype),  # tap sums in f32, compute in x's dtype
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _up2x_conv(x, k):
    """_up2x_conv_dilated with a spatially-partitionable backward.

    custom_vjp because GSPMD mis-partitions the BACKWARD of an lhs-dilated
    conv under spatial (H) sharding: measured on the 8-device CPU mesh,
    forward exact but encoder gradients off by O(1) relative while the
    literal two-op composition stays at 4e-6.  The backward here therefore
    differentiates the literal composition — mathematically the same
    function, so the same gradient — whose partitioning is proven by
    tests/test_spatial_sharding.py.  The cost is re-materializing the
    full-res upsampled tensor in the backward; unsharded training uses the
    plain _up2x_conv_dilated instead (UpConv(bwd="dilated")).
    """
    return _up2x_conv_dilated(x, k)


def _up2x_conv_fwd(x, k):
    return _up2x_conv(x, k), (x, k)


def _up2x_conv_bwd(res, g):
    x, k = res
    _, vjp = jax.vjp(_up2x_conv_literal, x, k)
    return vjp(g)


_up2x_conv.defvjp(_up2x_conv_fwd, _up2x_conv_bwd)


class _DilatedUpConv(nn.Module):
    """Fused upsample-conv (see _up2x_conv).  The full-resolution upsampled
    intermediate is never materialized in the forward — on TPU the
    broadcast + conv-input relayout around it was the single hottest item
    of the b1 headline profile (UpConv_4: 1.78 ms of 12.45; fusing it took
    the b1 forward 12.71 -> 10.82 ms, PERFORMANCE.md round 3).  Param tree
    identical to the unfused path: this module is named ``Conv_0`` with the
    same (3,3,cin,cout) kernel and init.

    ``bwd`` selects the gradient lowering: "literal" (default) is the
    GSPMD-proven custom_vjp that re-runs the two-op composition in the
    backward (required under spatial sharding); "dilated" lets AD
    differentiate the lhs-dilated conv directly, so the full-res upsampled
    intermediate is never materialized in the backward either (unsharded /
    pure-DP training only — batch sharding never splits H/W).
    """

    features: int
    dtype: Dtype = jnp.float32
    bwd: str = "literal"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        fn = _up2x_conv_dilated if self.bwd == "dilated" else _up2x_conv
        y = fn(x.astype(self.dtype), k)
        return y + b.astype(self.dtype)


class _FusedUpBlock(nn.Module):
    """ConvBlock-shaped wrapper for the fused upsample-conv (named so the
    param path stays ``UpConv_i/ConvBlock_0/Conv_0/{kernel,bias}``)."""

    features: int
    dtype: Dtype = jnp.float32
    bwd: str = "literal"

    @nn.compact
    def __call__(self, x):
        y = _DilatedUpConv(self.features, dtype=self.dtype, bwd=self.bwd, name="Conv_0")(x)
        return nn.elu(y)


class UpConv(nn.Module):
    """Nearest x2 upsample -> 3x3 SAME conv -> ELU (reference ``upconv``).

    ``fused=True`` (default) computes the mathematically-identical
    lhs-dilated conv without materializing the upsampled tensor (see
    _DilatedUpConv); ``fused=False`` keeps the literal two-op form (used by
    the equivalence test and as an escape hatch).  ``bwd`` see
    _DilatedUpConv.
    """

    features: int
    dtype: Dtype = jnp.float32
    fused: bool = True
    bwd: str = "literal"

    @nn.compact
    def __call__(self, x):
        if self.fused:
            return _FusedUpBlock(
                self.features, dtype=self.dtype, bwd=self.bwd, name="ConvBlock_0"
            )(x)
        x = upsample_nearest_2x(x)
        return ConvBlock(self.features, dtype=self.dtype)(x)


class AtrousConv(nn.Module):
    """Dense-ASPP cell (reference ``atrous_conv``):

        [BN] -> ReLU -> 1x1 conv (2*out) -> BN -> ReLU -> 3x3 dilated conv.

    ``apply_bn_first`` is False only for the first (rate-3) cell, matching
    the reference's dense ASPP wiring (SURVEY.md §2.6).
    """

    features: int
    dilation: int
    apply_bn_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.apply_bn_first:
            x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.features * 2,
            (1, 1),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.features,
            (3, 3),
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return x


class Reduction1x1(nn.Module):
    """Plane-coefficient head (reference ``reduction_1x1``, SURVEY.md §2.7).

    A stack of 1x1 convs halving ``num_filters`` down to 4, then either:
    - ``is_final``: 1 channel + sigmoid (direct scaled depth), or
    - 3 channels interpreted as spherical plane params
      (theta<=pi/3, phi<=2pi, dist<=max_depth) -> unit normal (n1,n2,n3)
      and distance n4 via bts_tpu.ops.lpg.plane_from_spherical.

    Returns raw head output; the caller applies the transform (keeps the
    head a pure matmul chain, and XLA fuses the elementwise transform into
    the producing conv).
    """

    num_filters: int
    is_final: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nf = self.num_filters
        while nf >= 4:
            if nf < 8:
                out_ch = 1 if self.is_final else 3
                x = nn.Conv(
                    out_ch, (1, 1), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32
                )(x)
                break
            x = nn.Conv(nf, (1, 1), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.elu(x)
            nf = nf // 2
        return x
