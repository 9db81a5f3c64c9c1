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
