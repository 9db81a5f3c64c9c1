"""Encoder forward parity against torch as an INDEPENDENT numeric oracle.

The tf-parity suite compares two in-repo re-expressions (flax vs the Keras
baseline), which a shared misreading could pass (VERDICT r2 "self-referential
parity").  Here the oracle is torch's own conv/BN kernels: we hand-build
torch modules with torchvision-exact module names (state_dict keys) and
geometry (symmetric stride-2 padding — Conv2d(k, stride=2, padding=k//2)),
push their state_dicts through utils.torch_converter, and require the flax
encoders (pad_style="torch") to reproduce every BTS feature tap.  This pins,
against an independently-implemented compute stack:

- the converter's transpose rules on REAL torch tensors (not synthesized
  inverses),
- the stride-2 window alignment (layers.pad2): TF-SAME pads (k//2-1, k//2)
  on even inputs, shifting every window one pixel vs torch's (k//2, k//2) —
  the negative-control test asserts the suite would catch that,
- BN inference math, residual/concat wiring, grouped/depthwise convs.

torchvision itself is not in the image; the module definitions below mirror
its graphs (verified against the state_dict key scheme the converter maps).
BN eps uses bts_tpu's 1.1e-5 on BOTH sides to isolate geometry; the eps
delta vs torchvision's 1e-5 is recorded in SURVEY.md §8 deviations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn

from bts_tpu.models.encoders import build_encoder
from bts_tpu.utils.torch_converter import convert_encoder, jax_to_py

EPS = 1.1e-5  # match bts_tpu.models.layers.BatchNorm


# -- torch reference modules (torchvision-named) ---------------------------


class _DenseLayer(tnn.Module):
    def __init__(self, c, g):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(c, eps=EPS)
        self.conv1 = tnn.Conv2d(c, 4 * g, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(4 * g, eps=EPS)
        self.conv2 = tnn.Conv2d(4 * g, g, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class _Transition(tnn.Module):
    def __init__(self, c, out):
        super().__init__()
        self.norm = tnn.BatchNorm2d(c, eps=EPS)
        self.conv = tnn.Conv2d(c, out, 1, bias=False)

    def forward(self, x):
        return tnn.functional.avg_pool2d(self.conv(torch.relu(self.norm(x))), 2)


class TorchDenseNet(tnn.Module):
    """torchvision.models.densenet graph + the 5 BTS taps."""

    def __init__(self, growth=32, blocks=(6, 12, 24, 16), init_feat=64):
        super().__init__()
        f = tnn.Module()
        f.conv0 = tnn.Conv2d(3, init_feat, 7, stride=2, padding=3, bias=False)
        f.norm0 = tnn.BatchNorm2d(init_feat, eps=EPS)
        c = init_feat
        for b, n in enumerate(blocks):
            blk = tnn.Module()
            for l in range(1, n + 1):
                setattr(blk, f"denselayer{l}", _DenseLayer(c, growth))
                c += growth
            setattr(f, f"denseblock{b + 1}", blk)
            if b < len(blocks) - 1:
                setattr(f, f"transition{b + 1}", _Transition(c, c // 2))
                c //= 2
        f.norm5 = tnn.BatchNorm2d(c, eps=EPS)
        self.features = f
        self.blocks = blocks

    def forward(self, x):
        f, taps = self.features, []
        x = torch.relu(f.norm0(f.conv0(x)))
        taps.append(x)  # relu0: H/2
        x = tnn.functional.max_pool2d(x, 3, stride=2, padding=1)
        taps.append(x)  # pool0: H/4
        for b, n in enumerate(self.blocks):
            blk = getattr(f, f"denseblock{b + 1}")
            for l in range(1, n + 1):
                x = getattr(blk, f"denselayer{l}")(x)
            if b < len(self.blocks) - 1:
                x = getattr(f, f"transition{b + 1}")(x)
                if b < 2:
                    taps.append(x)  # transition1: H/8, transition2: H/16
        taps.append(f.norm5(x))  # H/32, pre-ReLU
        return taps


class _Bottleneck(tnn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv2)."""

    def __init__(self, cin, width, cout, stride, groups):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width, eps=EPS)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, padding=1, groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width, eps=EPS)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout, eps=EPS)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout, eps=EPS),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        return torch.relu(self.bn3(self.conv3(y)) + idn)


class TorchResNet(tnn.Module):
    def __init__(self, sizes=(3, 4, 6, 3), groups=1, width_per_group=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=EPS)
        cin = 64
        for i, n in enumerate(sizes):
            cout = 256 * 2**i
            width = (64 * 2**i) if groups == 1 else groups * width_per_group * 2**i
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and i > 0) else 1
                blocks.append(_Bottleneck(cin, width, cout, stride, groups))
                cin = cout
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.sizes = sizes

    def forward(self, x):
        taps = []
        x = torch.relu(self.bn1(self.conv1(x)))
        taps.append(x)
        x = tnn.functional.max_pool2d(x, 3, stride=2, padding=1)
        for i in range(len(self.sizes)):
            x = getattr(self, f"layer{i + 1}")(x)
            taps.append(x)
        return taps


def _cbr6(cin, cout, k, s, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2, groups=groups, bias=False),
        tnn.BatchNorm2d(cout, eps=EPS),
        tnn.ReLU6(),
    )


class _InvRes(tnn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        layers = []
        if expand != 1:
            layers.append(_cbr6(cin, hidden, 1, 1))
        layers.append(_cbr6(hidden, hidden, 3, stride, groups=hidden))
        layers += [tnn.Conv2d(hidden, cout, 1, bias=False), tnn.BatchNorm2d(cout, eps=EPS)]
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


_MBV2 = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class TorchMobileNetV2(tnn.Module):
    def __init__(self):
        super().__init__()
        layers = [_cbr6(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s in _MBV2:
            for i in range(n):
                layers.append(_InvRes(cin, c, s if i == 0 else 1, t))
                cin = c
        layers.append(_cbr6(cin, 1280, 1, 1))
        self.features = tnn.Sequential(*layers)

    def forward(self, x):
        taps, tap_after = [], {1: 16, 3: 24, 6: 32, 13: 96}  # block idx -> ch
        x = self.features[0](x)
        for i in range(1, 18):
            x = self.features[i](x)
            if i in tap_after:
                taps.append(x)
        # final tap is the BN output PRE-ReLU6 (flax taps pre-activation)
        x = self.features[18][1](self.features[18][0](x))
        taps.append(x)
        return taps


# -- harness ----------------------------------------------------------------


def _randomize(model, seed):
    """Non-default weights everywhere (BN running stats included) so the
    comparison is meaningful; SMALL conv weights so activations stay O(1)
    through 100+ layers (lecun-ish scaling)."""
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        shape = tuple(v.shape)
        if k.endswith("running_var"):
            arr = rng.uniform(0.5, 2.0, shape)
        elif k.endswith("running_mean"):
            arr = rng.normal(0.0, 0.1, shape)
        elif v.ndim == 4:  # conv
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0.0, 1.0 / np.sqrt(fan_in), shape)
        elif k.endswith(".weight"):  # BN scale
            arr = rng.uniform(0.8, 1.2, shape)
        else:  # BN bias
            arr = rng.normal(0.0, 0.05, shape)
        sd[k] = torch.from_numpy(arr.astype(np.float32))
    model.load_state_dict(sd)
    return model


def _flax_taps(name, sd, images_nhwc, pad_style):
    enc = build_encoder(name, pad_style=pad_style)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    params, stats = convert_encoder(
        name, sd, jax_to_py(variables["params"]), jax_to_py(variables["batch_stats"])
    )
    taps = jax.jit(
        lambda p, s, x: enc.apply({"params": p, "batch_stats": s}, x, False)
    )(params, stats, jnp.asarray(images_nhwc))
    return [np.asarray(t) for t in taps]


_CASES = {
    "densenet121_bts": lambda: TorchDenseNet(32, (6, 12, 24, 16), 64),
    "resnet50_bts": lambda: TorchResNet((3, 4, 6, 3)),
    "resnext50_bts": lambda: TorchResNet((3, 4, 6, 3), groups=32, width_per_group=4),
    "mobilenetv2_bts": lambda: TorchMobileNetV2(),
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_encoder_matches_torch_oracle(name):
    tm = _randomize(_CASES[name]().eval(), seed=hash(name) % 2**31)
    rng = np.random.default_rng(7)
    images = rng.uniform(0.0, 1.0, (2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        torch_taps = tm(torch.from_numpy(images.transpose(0, 3, 1, 2)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    flax_taps = _flax_taps(name, sd, images, pad_style="torch")
    assert len(flax_taps) == len(torch_taps) == 5
    for i, (a, b) in enumerate(zip(torch_taps, flax_taps)):
        a = a.numpy().transpose(0, 2, 3, 1)
        assert a.shape == b.shape, f"tap {i}: {a.shape} vs {b.shape}"
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-4 * scale, err_msg=f"{name} tap {i}"
        )


def test_same_padding_differs_from_torch_negative_control():
    """Sensitivity check: under pad_style='same' the stem tap must NOT match
    the torch oracle (TF-SAME shifts the stride-2 window one input pixel) —
    otherwise the parity test above proves nothing about geometry."""
    tm = _randomize(TorchDenseNet(32, (6,), 64).eval(), seed=0)
    rng = np.random.default_rng(7)
    images = rng.uniform(0.0, 1.0, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        stem = tnn.functional.relu(
            tm.features.norm0(tm.features.conv0(torch.from_numpy(images.transpose(0, 3, 1, 2))))
        ).numpy().transpose(0, 2, 3, 1)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # full densenet121 tree for the converter; only the stem leaves matter here
    full = _randomize(TorchDenseNet(32, (6, 12, 24, 16), 64).eval(), seed=0)
    fsd = {k: v.numpy() for k, v in full.state_dict().items()}
    fsd["features.conv0.weight"] = sd["features.conv0.weight"]
    for stat in ("weight", "bias", "running_mean", "running_var"):
        fsd[f"features.norm0.{stat}"] = sd[f"features.norm0.{stat}"]
    taps = _flax_taps("densenet121_bts", fsd, images, pad_style="same")
    assert taps[0].shape == stem.shape
    assert np.abs(taps[0] - stem).max() > 1e-2


# -- decoder oracle (round 4: VERDICT r3 weak #2) ----------------------------
#
# The decoder (UpConv / dense-ASPP / reduction_1x1 / LPG / final head) was
# previously pinned only against the in-repo Keras re-expression — a shared
# misreading would pass.  Here the whole decoder math is re-implemented on
# torch's compute stack (interpolate/conv2d/batch_norm/sigmoid + an
# independent NCHW LPG with repeat_interleave + full-res strided slicing for
# the guidance maps, where the flax side uses broadcast-reshape LPG and the
# never-materialized lpg_strided), weights flow through
# utils.torch_converter.decoder_mapping, and the five outputs must agree.

import math


class _TorchUpConv(tnn.Module):
    """upconv: nearest x2 -> 3x3 conv -> ELU (models.layers.UpConv)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1)

    def forward(self, x):
        x = tnn.functional.interpolate(x, scale_factor=2, mode="nearest")
        return tnn.functional.elu(self.conv(x))


class _TorchAtrous(tnn.Module):
    """daspp cell: [BN] -> ReLU -> 1x1 (2*out) -> BN -> ReLU -> 3x3 dilated
    (models.layers.AtrousConv)."""

    def __init__(self, cin, cout, dilation, first_bn=True):
        super().__init__()
        if first_bn:
            self.first_bn = tnn.BatchNorm2d(cin, eps=EPS)
        self.conv1 = tnn.Conv2d(cin, cout * 2, 1)
        self.bn = tnn.BatchNorm2d(cout * 2, eps=EPS)
        self.conv2 = tnn.Conv2d(cout * 2, cout, 3, padding=dilation, dilation=dilation)

    def forward(self, x):
        if hasattr(self, "first_bn"):
            x = self.first_bn(x)
        x = self.conv1(torch.relu(x))
        return self.conv2(torch.relu(self.bn(x)))


class _TorchReduc(tnn.Module):
    """reduction_1x1: 1x1 convs halving nf0 to the 3ch plane / 1ch final
    head, ELU between (models.layers.Reduction1x1)."""

    def __init__(self, cin, nf0, is_final=False):
        super().__init__()
        j, nf, c = 0, nf0, cin
        while nf >= 4:
            out = (1 if is_final else 3) if nf < 8 else nf
            setattr(self, f"conv{j}", tnn.Conv2d(c, out, 1))
            c = out
            j += 1
            if nf < 8:
                break
            nf //= 2
        self.n = j

    def forward(self, x):
        for j in range(self.n - 1):
            x = tnn.functional.elu(getattr(self, f"conv{j}")(x))
        return getattr(self, f"conv{self.n - 1}")(x)


def _t_plane(raw, max_depth):
    """ops.lpg.plane_from_spherical on torch (NCHW: raw (B,3,h,w))."""
    theta = torch.sigmoid(raw[:, 0]) * (math.pi / 3)
    phi = torch.sigmoid(raw[:, 1]) * (math.pi * 2)
    dist = torch.sigmoid(raw[:, 2]) * max_depth
    return torch.stack(
        [torch.sin(theta) * torch.cos(phi), torch.sin(theta) * torch.sin(phi),
         torch.cos(theta), dist], 1)


def _t_lpg(plane, k):
    """ops.lpg.lpg_reference on torch: (B,4,h,w) -> (B, h*k, w*k), via
    repeat_interleave + full-res coordinate grids (a deliberately different
    expression of the same math)."""
    b, _, h, w = plane.shape
    pe = plane.repeat_interleave(k, 2).repeat_interleave(k, 3)
    off = (torch.arange(k, dtype=torch.float32) - (k - 1) / 2) / k
    u = off.repeat(w).view(1, 1, w * k)   # column (width) in-patch offset
    v = off.repeat(h).view(1, h * k, 1)   # row (height) in-patch offset
    return pe[:, 3] / (pe[:, 0] * u + pe[:, 1] * v + pe[:, 2])


class TorchBtsDecoder(tnn.Module):
    """The full BTS decoder on torch (models/bts.py::BtsDecoder wiring),
    named per utils.torch_converter.decoder_mapping."""

    def __init__(self, channels, nf, max_depth):
        super().__init__()
        c2, c4, c8, c16, cb = channels
        self.max_depth = max_depth
        self.upconv5 = _TorchUpConv(cb, nf)
        self.bn5 = tnn.BatchNorm2d(nf, eps=EPS)
        self.conv5 = tnn.Conv2d(nf + c16, nf, 3, padding=1)
        self.upconv4 = _TorchUpConv(nf, nf // 2)
        self.bn4 = tnn.BatchNorm2d(nf // 2, eps=EPS)
        self.conv4 = tnn.Conv2d(nf // 2 + c8, nf // 2, 3, padding=1)
        self.bn4_2 = tnn.BatchNorm2d(nf // 2, eps=EPS)
        co, cc4 = nf // 4, nf // 2 + c8
        self.daspp_3 = _TorchAtrous(nf // 2, co, 3, first_bn=False)
        self.daspp_6 = _TorchAtrous(cc4 + co, co, 6)
        self.daspp_12 = _TorchAtrous(cc4 + 2 * co, co, 12)
        self.daspp_18 = _TorchAtrous(cc4 + 3 * co, co, 18)
        self.daspp_24 = _TorchAtrous(cc4 + 4 * co, co, 24)
        self.daspp_conv = tnn.Conv2d(nf // 2 + 5 * co, co, 3, padding=1)
        self.reduc8x8 = _TorchReduc(co, nf // 4)
        self.upconv3 = _TorchUpConv(co, nf // 4)
        self.bn3 = tnn.BatchNorm2d(nf // 4, eps=EPS)
        self.conv3 = tnn.Conv2d(nf // 4 + c4 + 1, nf // 4, 3, padding=1)
        self.reduc4x4 = _TorchReduc(nf // 4, nf // 8)
        self.upconv2 = _TorchUpConv(nf // 4, nf // 8)
        self.bn2 = tnn.BatchNorm2d(nf // 8, eps=EPS)
        self.conv2 = tnn.Conv2d(nf // 8 + c2 + 1, nf // 8, 3, padding=1)
        self.reduc2x2 = _TorchReduc(nf // 8, nf // 16)
        self.upconv1 = _TorchUpConv(nf // 8, nf // 16)
        self.reduc1x1 = _TorchReduc(nf // 16, nf // 32, is_final=True)
        self.conv1 = tnn.Conv2d(nf // 16 + 4, nf // 16, 3, padding=1)
        self.get_depth = tnn.Conv2d(nf // 16, 1, 3, padding=1)

    def forward(self, feats, focal=None):
        F, md = tnn.functional, self.max_depth
        skip2, skip4, skip8, skip16, bottom = feats
        up5 = self.bn5(self.upconv5(torch.relu(bottom)))
        iconv5 = F.elu(self.conv5(torch.cat([up5, skip16], 1)))
        up4 = self.bn4(self.upconv4(iconv5))
        concat4 = torch.cat([up4, skip8], 1)
        iconv4 = self.bn4_2(F.elu(self.conv4(concat4)))
        d3 = self.daspp_3(iconv4)
        c2_ = torch.cat([concat4, d3], 1)
        d6 = self.daspp_6(c2_)
        c3_ = torch.cat([c2_, d6], 1)
        d12 = self.daspp_12(c3_)
        c4_ = torch.cat([c3_, d12], 1)
        d18 = self.daspp_18(c4_)
        d24 = self.daspp_24(torch.cat([c4_, d18], 1))
        daspp_feat = F.elu(
            self.daspp_conv(torch.cat([iconv4, d3, d6, d12, d18, d24], 1))
        )
        reduc8 = self.reduc8x8(daspp_feat)
        depth8 = _t_lpg(_t_plane(reduc8, md), 8) / md
        up3 = self.bn3(self.upconv3(daspp_feat))
        iconv3 = F.elu(
            self.conv3(torch.cat([up3, skip4, depth8[:, ::4, ::4].unsqueeze(1)], 1))
        )
        reduc4 = self.reduc4x4(iconv3)
        depth4 = _t_lpg(_t_plane(reduc4, md), 4) / md
        up2 = self.bn2(self.upconv2(iconv3))
        iconv2 = F.elu(
            self.conv2(torch.cat([up2, skip2, depth4[:, ::2, ::2].unsqueeze(1)], 1))
        )
        reduc2 = self.reduc2x2(iconv2)
        depth2 = _t_lpg(_t_plane(reduc2, md), 2) / md
        up1 = self.upconv1(iconv2)
        d1 = torch.sigmoid(self.reduc1x1(up1))
        iconv1 = F.elu(self.conv1(torch.cat(
            [up1, d1, depth2.unsqueeze(1), depth4.unsqueeze(1), depth8.unsqueeze(1)], 1)))
        final = md * torch.sigmoid(self.get_depth(iconv1))
        if focal is not None:
            final = final * (focal.view(-1, 1, 1, 1) / 715.0873)
        return depth8.unsqueeze(-1), depth4.unsqueeze(-1), depth2.unsqueeze(-1), d1, final


_DEC_CH = (16, 24, 32, 96, 320)  # skip2/4/8/16 + bottleneck channels
_NF = 128  # smallest num_features with the full reduc1x1 chain


def _rand_feats(rng, b, h, w):
    """Random encoder taps at H/2..H/32 (NHWC f32, O(1) magnitudes)."""
    dims = [(h // 2, w // 2), (h // 4, w // 4), (h // 8, w // 8),
            (h // 16, w // 16), (h // 32, w // 32)]
    return [rng.normal(0.0, 1.0, (b, hh, ww, c)).astype(np.float32)
            for (hh, ww), c in zip(dims, _DEC_CH)]


@pytest.mark.parametrize("use_focal", [False, True])
def test_decoder_matches_torch_oracle(use_focal):
    from bts_tpu.models.bts import BtsDecoder
    from bts_tpu.utils.torch_converter import convert_decoder

    md = 80.0 if use_focal else 10.0
    tm = _randomize(TorchBtsDecoder(_DEC_CH, _NF, md).eval(), seed=11)
    rng = np.random.default_rng(5)
    feats = _rand_feats(rng, 2, 64, 96)
    focal = rng.uniform(500.0, 800.0, (2,)).astype(np.float32) if use_focal else None
    with torch.no_grad():
        t_outs = tm(
            [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats],
            torch.from_numpy(focal) if use_focal else None,
        )

    dec = BtsDecoder(max_depth=md, num_features=_NF)
    jfeats = [jnp.asarray(f) for f in feats]
    variables = dec.init(jax.random.PRNGKey(0), jfeats, False)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_decoder(
        _NF, sd, jax_to_py(variables["params"]), jax_to_py(variables["batch_stats"])
    )
    f_outs = jax.jit(
        lambda p, s, x, fo: dec.apply({"params": p, "batch_stats": s}, x, False, fo)
    )(params, stats, jfeats, jnp.asarray(focal) if use_focal else None)

    names = ("depth8", "depth4", "depth2", "depth1x1", "final")
    assert len(f_outs) == len(t_outs) == 5
    for name, tt, ff in zip(names, t_outs, f_outs):
        a = tt.numpy()
        if a.ndim == 4 and a.shape[1] == 1:  # NCHW 1-ch -> NHWC
            a = a.transpose(0, 2, 3, 1)
        b = np.asarray(ff)
        assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-4 * scale, err_msg=f"decoder {name}"
        )


def test_decoder_oracle_negative_control():
    """Sensitivity: swapping the u/v (width/height) in-patch coordinate roles
    in the torch LPG must break parity — otherwise the decoder test above
    could not catch a transposed LPG."""
    tm = _randomize(TorchBtsDecoder(_DEC_CH, _NF, 10.0).eval(), seed=11)
    rng = np.random.default_rng(5)
    feats = _rand_feats(rng, 1, 64, 96)
    with torch.no_grad():
        reduc8 = tm.reduc8x8(
            torch.from_numpy(rng.normal(0, 1, (1, _NF // 4, 8, 12)).astype(np.float32))
        )
        plane = _t_plane(reduc8, 10.0)
        good = _t_lpg(plane, 8)
        swapped = _t_lpg(plane.transpose(2, 3).contiguous(), 8).transpose(1, 2)
    from bts_tpu.ops.lpg import lpg_reference

    jref = np.asarray(lpg_reference(jnp.asarray(plane.numpy().transpose(0, 2, 3, 1)), 8))
    np.testing.assert_allclose(jref, good.numpy(), rtol=1e-5, atol=1e-5)
    assert np.abs(jref - swapped.numpy()).max() > 1e-2


def test_full_model_torch_checkpoint_import(tmp_path):
    """The released-checkpoint import path (SURVEY §6 golden-parity, load
    half): a composed torch checkpoint in the upstream training layout
    ({'model': sd} wrapper, 'module.' DataParallel prefix,
    encoder.base_model.* / decoder.* subtrees) goes through the bts_convert
    CLI into a weights-only orbax checkpoint; the public bts_test restore
    path (sidecar-adopted torch geometry) must then reproduce the composed
    torch encoder->decoder forward."""
    enc_t = _randomize(TorchMobileNetV2().eval(), seed=3)
    dec_t = _randomize(TorchBtsDecoder((16, 24, 32, 96, 1280), _NF, 10.0).eval(), seed=4)
    rng = np.random.default_rng(9)
    images = rng.uniform(0.0, 1.0, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_final = dec_t(enc_t(torch.from_numpy(images.transpose(0, 3, 1, 2))))[-1]

    sd = {}
    for k, v in enc_t.state_dict().items():
        sd[f"module.encoder.base_model.{k}"] = v
    for k, v in dec_t.state_dict().items():
        sd[f"module.decoder.{k}"] = v
    ckpt = tmp_path / "bts_model.pth"
    torch.save({"model": sd, "global_step": 50000}, ckpt)

    from bts_tpu.cli.bts_convert import main as convert_main

    out = tmp_path / "converted"
    assert convert_main([
        "--torch_checkpoint", str(ckpt), "--encoder", "mobilenetv2_bts",
        "--bts_size", str(_NF), "--max_depth", "10", "--dataset", "nyu",
        "--checkpoint_path", str(out), "--compute_dtype", "float32",
    ]) == 0
    import os

    assert os.path.exists(out / "config.json")

    from bts_tpu.cli.bts_test import restore_state
    from bts_tpu.config import Config, adopt_sidecar_geometry
    from bts_tpu.models import create_model

    cfg = Config(mode="test", dataset="nyu", encoder="mobilenetv2_bts",
                 bts_size=_NF, max_depth=10.0, compute_dtype="float32",
                 checkpoint_path=str(out))
    cfg = adopt_sidecar_geometry(cfg)
    assert cfg.encoder_pad == "torch"  # geometry sidecar adopted
    model = create_model(cfg)
    state = restore_state(cfg, model, jnp.zeros((1, 64, 96, 3)))
    final = jax.jit(
        lambda p, s, x: model.apply({"params": p, "batch_stats": s}, x, False)[-1]
    )(state.params, state.batch_stats, jnp.asarray(images))
    a = t_final.numpy().transpose(0, 2, 3, 1)
    scale = max(np.abs(a).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(final), a, rtol=3e-4, atol=3e-4 * scale)


def test_split_full_state_dict_rejects_encoder_only():
    from bts_tpu.utils.torch_converter import split_full_state_dict

    with pytest.raises(ValueError, match="not a full BTS checkpoint"):
        split_full_state_dict({"features.conv0.weight": np.zeros((64, 3, 7, 7))})


# -- silog loss vs a torch boolean-gather oracle ----------------------------


def _torch_silog(depth_est, depth_gt, mask, variance_focus):
    """SURVEY.md §2.4 loss contract, expressed the torch-lineage way: boolean
    indexing gathers the valid pixels (dynamic shape — fine on CPU torch),
    whereas bts_tpu.ops.silog is mask-WEIGHTED for static shapes under jit.
    Agreement pins the weighted re-expression against an independent stack."""
    d = torch.log(depth_est[mask]) - torch.log(depth_gt[mask])
    return torch.sqrt((d * d).mean() - variance_focus * d.mean() ** 2) * 10.0


@pytest.mark.parametrize("variance_focus", [0.85, 0.5])
def test_silog_matches_torch_oracle(variance_focus):
    from bts_tpu.ops.silog import default_mask, silog_loss

    rng = np.random.default_rng(7)
    shape = (2, 44, 152, 1)
    pred = rng.uniform(0.5, 80.0, shape).astype(np.float32)
    # KITTI-style sparse gt: ~15% valid LiDAR returns, rest zero
    gt = np.where(
        rng.random(shape) < 0.15, rng.uniform(1.5, 80.0, shape), 0.0
    ).astype(np.float32)
    mask = np.asarray(default_mask(gt, "kitti"))

    t_pred = torch.from_numpy(pred).requires_grad_(True)
    t_loss = _torch_silog(
        t_pred, torch.from_numpy(gt), torch.from_numpy(mask), variance_focus
    )
    t_loss.backward()

    j_loss, j_grad = jax.value_and_grad(
        lambda p: silog_loss(p, jnp.asarray(gt), jnp.asarray(mask), variance_focus)
    )(jnp.asarray(pred))

    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-5)
    # gradient parity, incl. exact zeros outside the valid mask on both sides
    np.testing.assert_allclose(
        np.asarray(j_grad), t_pred.grad.numpy(), rtol=1e-4, atol=1e-7
    )
    assert np.all(np.asarray(j_grad)[~mask] == 0.0)


def test_silog_oracle_negative_control():
    """Sensitivity: evaluating the weighted form with the NYU mask threshold
    while the oracle gathers with the KITTI mask must break parity — the
    masks select different pixel sets, so agreement above is not vacuous."""
    from bts_tpu.ops.silog import default_mask, silog_loss

    rng = np.random.default_rng(9)
    shape = (1, 44, 152, 1)
    pred = rng.uniform(0.5, 80.0, shape).astype(np.float32)
    gt = np.where(
        rng.random(shape) < 0.3, rng.uniform(0.2, 80.0, shape), 0.0
    ).astype(np.float32)
    kitti = np.asarray(default_mask(gt, "kitti"))
    nyu = np.asarray(default_mask(gt, "nyu"))
    assert kitti.sum() < nyu.sum()  # thresholds 1.0 vs 0.1 really differ here

    t = _torch_silog(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(kitti), 0.85
    )
    j = silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(nyu), 0.85)
    assert abs(float(j) - float(t)) > 1e-3
