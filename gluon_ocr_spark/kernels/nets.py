"""Deterministic NumPy forwards with the reference nets' topology.

These are the SURVEY §7 step-2 kernels: seeded-weight, pure-NumPy
inference-mode forwards reproducing the reference architectures'
dataflow (not their learned weights — no MXNet in this container, and
the contract here is determinism, not OCR accuracy):

* :class:`DBNetNumpy` — DBNet (``gluonocr/model_zoo/dbnet/db_net.py:43-75``):
  4-stage strided backbone → 1×1 ``ins_proj`` → top-down FPN merge
  (bilinear upsample + add) → 3×3 ``outs`` heads upsampled to /4 and
  concatenated → ``binarize`` head (conv3×3-BN-relu, deconv2×2s2-BN-
  relu, deconv2×2s2, sigmoid) and, when adaptive, the ``thresh`` head
  of the same shape plus ``thresh_binary = sigmoid(k·(binary−thresh))``
  with k=10 (db_net.py:70-73).
* :class:`CRNNNumpy` — CRNN (``gluonocr/model_zoo/crnn/crnn.py:28-38``):
  asymmetric-stride conv backbone (H collapses, W is the sequence
  axis, crnn.py:60-62 strides) → NTC transpose/reshape → BiLSTM →
  dense ``voc_size`` logits, ready for the T1/T2 CTC kernels.
* :class:`EASTNumpy` — EAST (``gluonocr/model_zoo/east/east.py:45-58``):
  reversed feature list, 3× (nearest-2× upsample, concat, 1×1+3×3
  conv block) merge, sigmoid score head, and the QUAD geometry head
  ``(sigmoid(·) − 0.5) · 2 · 800``.

All weights come from one seeded ``numpy.random.Generator`` (Xavier
for convs/dense, zeros/ones for BN β/γ, zero running means, unit
running vars) so any process that constructs the same class with the
same seed computes bit-identical maps — the property the Spark
oracle-parity gate needs. Weight dicts are plain ``{name: ndarray}``
so ``SparkContext.broadcast`` ships them to executors once (the S10
weights-source pattern).

Everything is float64 NCHW. Sizes are kept small (tens of channels)
— these kernels exist for dataflow parity and distributed plumbing,
not throughput; the production extraction path is the DOM kernel.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DBNetNumpy", "CRNNNumpy", "EASTNumpy", "AttEncoderNumpy", "STNNumpy", "CLRSNumpy"]


# ---------------------------------------------------------------------------
# primitive layers (inference mode)
# ---------------------------------------------------------------------------


def _xavier(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
    fan_out = shape[0] * (int(np.prod(shape[2:])) if len(shape) > 2 else 1)
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-limit, limit, size=shape)


def conv2d(x: np.ndarray, w: np.ndarray, stride: int = 1, pad: int = 0) -> np.ndarray:
    """NCHW conv via im2col; ``w`` is (out_c, in_c, kh, kw), no bias
    (the reference uses use_bias=False ahead of BN)."""
    n, c, h, wd = x.shape
    oc, _, kh, kw = w.shape
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (x.shape[2] - kh) // stride + 1
    ow = (x.shape[3] - kw) // stride + 1
    # im2col: (n, c*kh*kw, oh*ow)
    cols = np.empty((n, c * kh * kw, oh * ow), dtype=x.dtype)
    idx = 0
    for i in range(kh):
        for j in range(kw):
            patch = x[:, :, i : i + oh * stride : stride, j : j + ow * stride : stride]
            cols[:, idx * c : (idx + 1) * c, :] = patch.reshape(n, c, -1)
            idx += 1
    # weights must be laid out to match the (kh,kw major, c minor) col order
    wmat = w.transpose(2, 3, 1, 0).reshape(-1, oc)  # (kh*kw*c, oc)
    out = np.einsum("nkp,ko->nop", cols, wmat)
    return out.reshape(n, oc, oh, ow)


def deconv2x2_s2(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """2×2 stride-2 transposed conv (the DBNet head's upsampler):
    non-overlapping, so each input pixel paints one 2×2 output block.
    ``w`` is (in_c, out_c, 2, 2)."""
    n, c, h, wd = x.shape
    oc = w.shape[1]
    out = np.einsum("nchw,cokl->nohkwl", x, w)
    return out.reshape(n, oc, 2 * h, 2 * wd)


def batchnorm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Inference BN with zero running mean / unit running var (the
    seeded-weight convention): reduces to an affine per channel."""
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return x * gamma.reshape(shape) / np.sqrt(1.0 + eps) + beta.reshape(shape)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def hard_sigmoid(x: np.ndarray) -> np.ndarray:
    """MobileNetV3 hard sigmoid: relu6(x+3)/6 (mobilenetv3.py:38-59)."""
    return np.clip(x + 3.0, 0.0, 6.0) / 6.0


def hard_swish(x: np.ndarray) -> np.ndarray:
    return x * hard_sigmoid(x)


def depthwise_conv2d(x: np.ndarray, w: np.ndarray, stride: int = 1, pad: int = 0) -> np.ndarray:
    """Grouped conv with groups == channels; w is (C, 1, kh, kw) —
    the MNv3 ``num_groups=num_mid`` depthwise (mobilenetv3.py:118-121)."""
    return np.concatenate(
        [conv2d(x[:, c : c + 1], w[c : c + 1], stride, pad) for c in range(x.shape[1])],
        axis=1,
    )


def bilinear_resize(x: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """NCHW bilinear resize, align_corners=True (matches MXNet's
    ``F.contrib.BilinearResize2D(..., mode='like')`` used by the FPN
    merge, db_net.py:54-56)."""
    n, c, h, w = x.shape
    if (h, w) == (oh, ow):
        return x
    ys = np.linspace(0, h - 1, oh) if oh > 1 else np.zeros(1)
    xs = np.linspace(0, w - 1, ow) if ow > 1 else np.zeros(1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).reshape(-1, 1)
    wx = (xs - x0).reshape(1, -1)
    a = x[:, :, y0][:, :, :, x0]
    b = x[:, :, y0][:, :, :, x1]
    cc = x[:, :, y1][:, :, :, x0]
    d = x[:, :, y1][:, :, :, x1]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + cc * wy * (1 - wx) + d * wy * wx


def nearest_up2(x: np.ndarray) -> np.ndarray:
    """2× nearest upsample (EAST merge, east.py:52 ``F.UpSampling``)."""
    return x.repeat(2, axis=2).repeat(2, axis=3)


def lstm_step(x, h, c, wx, wh, b):
    """One LSTM step; gate order i, f, g, o."""
    gates = x @ wx + h @ wh + b
    hs = gates.shape[-1] // 4
    i = sigmoid(gates[:, :hs])
    f = sigmoid(gates[:, hs : 2 * hs])
    g = np.tanh(gates[:, 2 * hs : 3 * hs])
    o = sigmoid(gates[:, 3 * hs :])
    c2 = f * c + i * g
    return o * np.tanh(c2), c2


def lstm_forward(x: np.ndarray, wx, wh, b, reverse: bool = False) -> np.ndarray:
    """(N, T, F) → (N, T, H) single-direction LSTM."""
    n, t, _ = x.shape
    hs = wh.shape[0]
    h = np.zeros((n, hs))
    c = np.zeros((n, hs))
    steps = range(t - 1, -1, -1) if reverse else range(t)
    out = np.empty((n, t, hs))
    for j in steps:
        h, c = lstm_step(x[:, j, :], h, c, wx, wh, b)
        out[:, j, :] = h
    return out


# ---------------------------------------------------------------------------
# DBNet
# ---------------------------------------------------------------------------


class DBNetNumpy:
    """Seeded DBNet-topology forward. Input (N, in_c, H, W) with H, W
    divisible by 32 → dict of maps at input resolution:
    ``binary``, ``thresh``, ``thresh_binary`` (each (N, 1, H, W)).

    ``backbone``: ``"conv"`` (plain strided 3×3 stages) or ``"mnv3"``
    — MobileNetV3 inverted-residual stages per the reference's
    _ResUnit (mobilenetv3.py:105-141): expand 1×1 → depthwise 3×3
    stride 2 → squeeze-excite (later stages) → linear project 1×1,
    relu in the early stages and hard-swish later, matching the zoo's
    small-config activation split (mobilenetv3.py:155-353). Covers
    the backbone zoo's second dataflow shape (N9)."""

    STAGE_CH = (8, 12, 16, 24)  # /4 /8 /16 /32 feature channels

    def __init__(
        self,
        seed: int = 7,
        in_channels: int = 3,
        inner: int = 16,
        k: float = 10.0,
        adaptive: bool = True,
        backbone: str = "conv",
    ):
        self.k = k
        self.adaptive = adaptive
        self.backbone = backbone
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}
        prev = in_channels
        # backbone: stem /2 then four strided stages → /4 /8 /16 /32
        w["stem"] = _xavier(rng, (self.STAGE_CH[0], prev, 3, 3))
        prev = self.STAGE_CH[0]
        if backbone == "mnv3":
            for i, ch in enumerate(self.STAGE_CH):
                mid = ch * 2  # expansion factor 2 keeps the probe tiny
                w[f"s{i}_exp"] = _xavier(rng, (mid, prev, 1, 1))
                w[f"s{i}_dw"] = _xavier(rng, (mid, 1, 3, 3))
                if i >= 2:  # SE on the deeper stages, ratio 4
                    w[f"s{i}_se1"] = _xavier(rng, (mid // 4, mid, 1, 1))
                    w[f"s{i}_se1b"] = np.zeros(mid // 4)
                    w[f"s{i}_se2"] = _xavier(rng, (mid, mid // 4, 1, 1))
                    w[f"s{i}_se2b"] = np.zeros(mid)
                w[f"s{i}_proj"] = _xavier(rng, (ch, mid, 1, 1))
                prev = ch
        else:
            for i, ch in enumerate(self.STAGE_CH):
                w[f"stage{i}"] = _xavier(rng, (ch, prev, 3, 3))
                prev = ch
        # ins_proj 1×1 to inner; outs 3×3 to inner//4 (db_net.py:19-21)
        for i, ch in enumerate(self.STAGE_CH):
            w[f"proj{i}"] = _xavier(rng, (inner, ch, 1, 1))
            w[f"out{i}"] = _xavier(rng, (inner // 4, inner, 3, 3))
        for head in ("binarize",) + (("thresh",) if adaptive else ()):
            in_c = inner if head == "binarize" else inner + 1  # thresh sees fuse+binary concat
            w[f"{head}_c0"] = _xavier(rng, (inner // 4, in_c, 3, 3))
            w[f"{head}_g0"] = np.ones(inner // 4)
            w[f"{head}_b0"] = np.zeros(inner // 4)
            w[f"{head}_d1"] = _xavier(rng, (inner // 4, inner // 4, 2, 2))
            w[f"{head}_g1"] = np.ones(inner // 4)
            w[f"{head}_b1"] = np.zeros(inner // 4)
            w[f"{head}_d2"] = _xavier(rng, (inner // 4, 1, 2, 2))
        self.weights = w
        self.inner = inner

    def _head(self, name: str, fuse: np.ndarray) -> np.ndarray:
        w = self.weights
        y = relu(batchnorm(conv2d(fuse, w[f"{name}_c0"], pad=1), w[f"{name}_g0"], w[f"{name}_b0"]))
        y = relu(batchnorm(deconv2x2_s2(y, w[f"{name}_d1"]), w[f"{name}_g1"], w[f"{name}_b1"]))
        return sigmoid(deconv2x2_s2(y, w[f"{name}_d2"]))

    def _mnv3_stage(self, y: np.ndarray, i: int) -> np.ndarray:
        """_ResUnit with stride 2 (no shortcut per mobilenetv3.py:128):
        expand → depthwise → (SE) → linear project."""
        w = self.weights
        act = relu if i < 2 else hard_swish
        out = act(conv2d(y, w[f"s{i}_exp"]))
        out = act(depthwise_conv2d(out, w[f"s{i}_dw"], stride=2, pad=1))
        if f"s{i}_se1" in w:
            s = out.mean(axis=(2, 3), keepdims=True)  # global pool
            s = relu(conv2d(s, w[f"s{i}_se1"]) + w[f"s{i}_se1b"][None, :, None, None])
            s = hard_sigmoid(conv2d(s, w[f"s{i}_se2"]) + w[f"s{i}_se2b"][None, :, None, None])
            out = out * s
        return conv2d(out, w[f"s{i}_proj"])  # linear (use_act=False)

    def forward(self, x: np.ndarray) -> dict[str, np.ndarray]:
        w = self.weights
        x = np.asarray(x, dtype=np.float64)
        y = relu(conv2d(x, w["stem"], stride=2, pad=1))
        feats = []
        for i in range(4):
            y = (
                self._mnv3_stage(y, i)
                if self.backbone == "mnv3"
                else relu(conv2d(y, w[f"stage{i}"], stride=2, pad=1))
            )
            feats.append(y)
        proj = [conv2d(f, w[f"proj{i}"]) for i, f in enumerate(feats)]
        in2, in3, in4, in5 = proj
        # top-down merge (db_net.py:54-56)
        out4 = bilinear_resize(in5, *in4.shape[2:]) + in4
        out3 = bilinear_resize(out4, *in3.shape[2:]) + in3
        out2 = bilinear_resize(out3, *in2.shape[2:]) + in2
        outs = []
        for i, f in enumerate((out2, out3, out4, in5)):
            o = conv2d(f, w[f"out{i}"], pad=1)
            outs.append(bilinear_resize(o, *in2.shape[2:]))
        fuse = np.concatenate(outs, axis=1)
        binary = self._head("binarize", fuse)
        if not self.adaptive:
            return {"binary": binary}
        # thresh head sees fuse ⧺ downsampled binary (db_net.py:69-71)
        temp = bilinear_resize(binary, *fuse.shape[2:])
        thresh = self._head("thresh", np.concatenate([fuse, temp], axis=1))
        thresh_binary = sigmoid(self.k * (binary - thresh))
        return {"binary": binary, "thresh": thresh, "thresh_binary": thresh_binary}


# ---------------------------------------------------------------------------
# CRNN
# ---------------------------------------------------------------------------


class CRNNNumpy:
    """Seeded CRNN-topology forward: (N, in_c, 32, W) → logits
    (N, W//2, voc_size). Backbone strides follow the reference's
    asymmetric pattern (height collapses fully, width only /4 so the
    sequence axis stays long — crnn.py:60-62)."""

    def __init__(self, seed: int = 11, in_channels: int = 3, voc_size: int = 37, hidden: int = 32):
        self.voc_size = voc_size
        self.hidden = hidden
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}
        chans = (8, 16, 24, 32, 32)
        strides = ((2, 1), (2, 2), (2, 1), (2, 1), (2, 1))  # H: 32→1, W: W→W//2... see below
        prev = in_channels
        for i, (ch, st) in enumerate(zip(chans, strides)):
            w[f"conv{i}"] = _xavier(rng, (ch, prev, 3, 3))
            w[f"stride{i}"] = np.array(st)
            prev = ch
        feat = chans[-1]
        for d, pre in (("fw", "l0"), ("bw", "l0"), ("fw", "l1"), ("bw", "l1")):
            inp = feat if pre == "l0" else 2 * hidden
            w[f"{pre}_{d}_wx"] = _xavier(rng, (inp, 4 * hidden))
            w[f"{pre}_{d}_wh"] = _xavier(rng, (hidden, 4 * hidden))
            w[f"{pre}_{d}_b"] = np.zeros(4 * hidden)
        w["fc_w"] = _xavier(rng, (2 * hidden, voc_size))
        w["fc_b"] = np.zeros(voc_size)
        self.weights = w
        self._strides = strides

    def forward(self, x: np.ndarray) -> np.ndarray:
        w = self.weights
        y = np.asarray(x, dtype=np.float64)
        for i in range(5):
            sh, sw = (int(s) for s in w[f"stride{i}"])
            # asymmetric stride via stride=1 conv + strided slice keeps
            # conv2d simple; equivalent to strided conv for 3×3/pad 1
            y = relu(conv2d(y, w[f"conv{i}"], pad=1))
            y = y[:, :, ::sh, ::sw]
        # (N,C,H,W) → (N,W,H*C); H is 1 after the stride stack
        n, c, h, wd = y.shape
        seq = y.transpose(0, 3, 2, 1).reshape(n, wd, h * c)
        for layer in ("l0", "l1"):
            fw = lstm_forward(seq, w[f"{layer}_fw_wx"], w[f"{layer}_fw_wh"], w[f"{layer}_fw_b"])
            bw = lstm_forward(seq, w[f"{layer}_bw_wx"], w[f"{layer}_bw_wh"], w[f"{layer}_bw_b"], reverse=True)
            seq = np.concatenate([fw, bw], axis=-1)
        return seq @ w["fc_w"] + w["fc_b"]


# ---------------------------------------------------------------------------
# EAST
# ---------------------------------------------------------------------------


class EASTNumpy:
    """Seeded EAST-topology forward: (N, in_c, H, W), H,W divisible by
    32 → (score (N,1,H/4,W/4), geometry (N,8,H/4,W/4)). Geometry is the
    QUAD head: ``(sigmoid(·) − 0.5) · 2 · 800`` (east.py:57)."""

    STAGE_CH = (8, 12, 16, 24)
    MERGE_CH = (16, 16, 16)
    HEAD_CH = 8

    def __init__(self, seed: int = 13, in_channels: int = 3):
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}
        prev = in_channels
        w["stem"] = _xavier(rng, (self.STAGE_CH[0], prev, 3, 3))
        prev = self.STAGE_CH[0]
        for i, ch in enumerate(self.STAGE_CH):
            w[f"stage{i}"] = _xavier(rng, (ch, prev, 3, 3))
            prev = ch
        # merge blocks: 1×1 then 3×3, each + BN + relu (east.py:35-42)
        ins = (
            self.STAGE_CH[3] + self.STAGE_CH[2],
            self.MERGE_CH[0] + self.STAGE_CH[1],
            self.MERGE_CH[1] + self.STAGE_CH[0],
        )
        for i, (inc, ch) in enumerate(zip(ins, self.MERGE_CH)):
            w[f"m{i}_c1"] = _xavier(rng, (ch, inc, 1, 1))
            w[f"m{i}_g1"] = np.ones(ch)
            w[f"m{i}_b1"] = np.zeros(ch)
            w[f"m{i}_c3"] = _xavier(rng, (ch, ch, 3, 3))
            w[f"m{i}_g3"] = np.ones(ch)
            w[f"m{i}_b3"] = np.zeros(ch)
        for head, out_c in (("score", 1), ("geo", 8)):
            w[f"{head}_c0"] = _xavier(rng, (self.HEAD_CH, self.MERGE_CH[2], 3, 3))
            w[f"{head}_g0"] = np.ones(self.HEAD_CH)
            w[f"{head}_b0"] = np.zeros(self.HEAD_CH)
            w[f"{head}_c1"] = _xavier(rng, (out_c, self.HEAD_CH, 1, 1))
        self.weights = w

    def forward(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        w = self.weights
        y = relu(conv2d(np.asarray(x, dtype=np.float64), w["stem"], stride=2, pad=1))
        feats = []
        for i in range(4):
            y = relu(conv2d(y, w[f"stage{i}"], stride=2, pad=1))
            feats.append(y)
        feats = feats[::-1]  # east.py:49
        h = feats[0]
        for i in range(3):
            h = nearest_up2(h)
            h = np.concatenate([h, feats[i + 1]], axis=1)
            h = relu(batchnorm(conv2d(h, w[f"m{i}_c1"]), w[f"m{i}_g1"], w[f"m{i}_b1"]))
            h = relu(batchnorm(conv2d(h, w[f"m{i}_c3"], pad=1), w[f"m{i}_g3"], w[f"m{i}_b3"]))
        s = relu(batchnorm(conv2d(h, w["score_c0"], pad=1), w["score_g0"], w["score_b0"]))
        score = sigmoid(conv2d(s, w["score_c1"]))
        g = relu(batchnorm(conv2d(h, w["geo_c0"], pad=1), w["geo_g0"], w["geo_b0"]))
        geometry = (sigmoid(conv2d(g, w["geo_c1"])) - 0.5) * 2.0 * 800.0
        return score, geometry


# ---------------------------------------------------------------------------
# Attention encoder (N5)
# ---------------------------------------------------------------------------


class AttEncoderNumpy:
    """Seeded attention-ENCODER forward with the reference topology
    (``gluonocr/model_zoo/att_recog/att_encoder.py:8-46``): conv
    backbone → per-pixel mask multiply → NTC transpose/reshape →
    BiLSTM → ``pre_compute`` dense(tanh) projection to match_dim.
    Returns (output, out_proj, seq_mask); ``out_proj`` rows are the
    pre-projected keys the greedy attention decoder consumes
    (:class:`..attention.GreedyAttentionDecoder` expects match_dim
    keys — wire ``match_dim=32`` to its default)."""

    def __init__(self, seed: int = 17, in_channels: int = 3, hidden: int = 24, match_dim: int = 32):
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}
        chans = (8, 16, 24, 24)
        strides = ((2, 2), (2, 2), (2, 1), (2, 1))  # H 32→2, W→W/4 (att_encoder.py:57)
        prev = in_channels
        for i, (ch, st) in enumerate(zip(chans, strides)):
            w[f"conv{i}"] = _xavier(rng, (ch, prev, 3, 3))
            w[f"stride{i}"] = np.array(st)
            prev = ch
        feat = chans[-1] * 2  # H collapses to 2 → features H*C
        for d, pre in (("fw", "l0"), ("bw", "l0"), ("fw", "l1"), ("bw", "l1")):
            inp = feat if pre == "l0" else 2 * hidden
            w[f"{pre}_{d}_wx"] = _xavier(rng, (inp, 4 * hidden))
            w[f"{pre}_{d}_wh"] = _xavier(rng, (hidden, 4 * hidden))
            w[f"{pre}_{d}_b"] = np.zeros(4 * hidden)
        w["proj_w"] = _xavier(rng, (2 * hidden, match_dim))
        w["proj_b"] = np.zeros(match_dim)
        self.weights = w
        self.hidden = hidden

    def forward(self, x: np.ndarray, mask: np.ndarray | None = None):
        w = self.weights
        y = np.asarray(x, dtype=np.float64)
        for i in range(4):
            sh, sw = (int(s) for s in w[f"stride{i}"])
            y = relu(conv2d(y, w[f"conv{i}"], pad=1))
            y = y[:, :, ::sh, ::sw]
        if mask is None:
            mask = np.ones((y.shape[0], 1, y.shape[2], y.shape[3]))
        y = y * mask  # broadcast_mul (att_encoder.py:36)
        n, c, h, wd = y.shape
        seq = y.transpose(0, 3, 2, 1).reshape(n, wd, h * c)  # NTC, W is time
        # per-TIMESTEP mask (n, W): the conv stack collapses H to 2,
        # so reduce the spatial mask over the height axis (a timestep
        # is valid if any of its pixels is) — ADVICE r2: the raw
        # (n, w*h) reshape had 2 entries per timestep and could not
        # mask the (N, T, ·) sequence the decoder consumes.
        seq_mask = mask.max(axis=(1, 2))  # (n, 1, h, wd) → (n, wd)
        for layer in ("l0", "l1"):
            fw = lstm_forward(seq, w[f"{layer}_fw_wx"], w[f"{layer}_fw_wh"], w[f"{layer}_fw_b"])
            bw = lstm_forward(seq, w[f"{layer}_bw_wx"], w[f"{layer}_bw_wh"], w[f"{layer}_bw_b"], reverse=True)
            seq = np.concatenate([fw, bw], axis=-1)
        out_proj = np.tanh(seq @ w["proj_w"] + w["proj_b"])
        return seq, out_proj, seq_mask


# ---------------------------------------------------------------------------
# STN (N7)
# ---------------------------------------------------------------------------


def grid_generator_warp(flow: np.ndarray) -> np.ndarray:
    """MXNet ``GridGenerator(transform_type='warp')``: a (N,2,H,W)
    per-pixel flow becomes a normalized sampling grid — target pixel
    (i,j) samples source (j+flow_x, i+flow_y), mapped to [-1,1] via
    x_norm = 2x/(W−1) − 1."""
    n, _, h, w = flow.shape
    xs = np.arange(w).reshape(1, 1, w)
    ys = np.arange(h).reshape(1, h, 1)
    gx = (xs + flow[:, 0]) * 2.0 / max(w - 1, 1) - 1.0
    gy = (ys + flow[:, 1]) * 2.0 / max(h - 1, 1) - 1.0
    return np.stack([gx, gy], axis=1)


def bilinear_sampler(x: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """MXNet ``BilinearSampler``: sample (N,C,H,W) at the normalized
    grid with zero padding outside the image."""
    n, c, h, w = x.shape
    sx = (grid[:, 0] + 1.0) * (w - 1) / 2.0  # (N,H',W')
    sy = (grid[:, 1] + 1.0) * (h - 1) / 2.0
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    out = np.zeros((n, c) + sx.shape[1:], dtype=x.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (1 - np.abs(sx - xi)) * (1 - np.abs(sy - yi))
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = np.clip(xi, 0, w - 1)
            yi_c = np.clip(yi, 0, h - 1)
            for b in range(n):
                sample = x[b][:, yi_c[b], xi_c[b]]  # (C,H',W')
                out[b] += sample * (wgt[b] * valid[b])
    return out


class STNNumpy:
    """Seeded spatial-transformer forward (``gluonocr/nn/stn.py:4-18``):
    localization net (conv3×3→relu→conv3×3→tanh) emits a per-pixel
    2-channel warp field; warp-mode grid generation + bilinear
    sampling resample the input. Reference keeps STN default-off
    (use_stn=False); provided for the N7 coverage row."""

    def __init__(self, seed: int = 19, in_channels: int = 3, hidden: int = 8):
        rng = np.random.default_rng(seed)
        self.w0 = _xavier(rng, (hidden, in_channels, 3, 3))
        self.w1 = _xavier(rng, (2, hidden, 3, 3))

    def forward(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        flow = np.tanh(conv2d(relu(conv2d(x, self.w0, pad=1)), self.w1, pad=1))
        grid = grid_generator_warp(flow)
        return bilinear_sampler(x, grid)


# ---------------------------------------------------------------------------
# CLRS (N4)
# ---------------------------------------------------------------------------


def deconv_s2_generic(x: np.ndarray, w: np.ndarray, k: int, stride: int) -> np.ndarray:
    """Transposed conv, kernel k, arbitrary stride (scatter-add form).
    ``w`` is (in_c, out_c, k, k)."""
    n, c, h, wd = x.shape
    oc = w.shape[1]
    oh = (h - 1) * stride + k
    ow = (wd - 1) * stride + k
    out = np.zeros((n, oc, oh, ow), dtype=x.dtype)
    contrib = np.einsum("nchw,cokl->nohkwl", x, w)  # (n,oc,h,k,w,k)
    for ki in range(k):
        for kj in range(k):
            out[:, :, ki : ki + h * stride : stride, kj : kj + wd * stride : stride] += contrib[
                :, :, :, ki, :, kj
            ]
    return out


class CLRSNumpy:
    """Seeded CLRS-topology forward (``gluonocr/model_zoo/clrs/clrs.py``):

    * backbone + extra layers give a multi-scale feature list;
    * DM cascade (clrs.py:10-29): deconv(top)·conv(lateral) gated by an
      elementwise PRODUCT then relu — CLRS's signature fusion (vs the
      FPN's sum);
    * PM heads (clrs.py:31-50): skip 1×1 + bone 1×1³, relu(sum), then
      conf (k·(classes+1)) and loc (k·4) 3×3 heads per scale;
    * SegPred (clrs.py:78-106): SM blocks (skip+bone relu-sum, nearest
      upsample to common scale), add_n fusion, deconv tail → 4-channel
      sigmoid seg maps (the position-sensitive maps D17 consumes).

    The gluoncv anchor generator / box decoder / box_nms stay out of
    slice (SSD plumbing); the outputs here are the raw per-scale
    (cls, loc) heads + seg maps, which the D17 post-process and G6
    targets already cover downstream."""

    def __init__(self, seed: int = 23, in_channels: int = 3, dm: int = 12, pm: int = 12, sm: int = 8, k: int = 4):
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}
        self.k = k
        chans = (8, 12, 16)
        prev = in_channels
        w["stem"] = _xavier(rng, (chans[0], prev, 3, 3))
        prev = chans[0]
        for i, ch in enumerate(chans):  # /4 /8 /16
            w[f"stage{i}"] = _xavier(rng, (ch, prev, 3, 3))
            prev = ch
        for i in range(2):  # extras: /32 /64
            w[f"extra{i}_c1"] = _xavier(rng, (8, prev, 1, 1))
            w[f"extra{i}_c3"] = _xavier(rng, (16, 8, 3, 3))
            prev = 16
        # DM cascade over the 5 scales (4 merges), top-down
        ins = (16, 16, 12, 8)  # lateral channels at /32 /16 /8 /4
        for i in range(4):
            w[f"dm{i}_dc"] = _xavier(rng, (dm if i else 16, dm, 2, 2))
            w[f"dm{i}_dconv"] = _xavier(rng, (dm, dm, 3, 3))
            w[f"dm{i}_g0"] = np.ones(dm)
            w[f"dm{i}_b0"] = np.zeros(dm)
            w[f"dm{i}_cv0"] = _xavier(rng, (dm, ins[i], 3, 3))
            w[f"dm{i}_g1"] = np.ones(dm)
            w[f"dm{i}_b1"] = np.zeros(dm)
            w[f"dm{i}_cv1"] = _xavier(rng, (dm, dm, 3, 3))
            w[f"dm{i}_g2"] = np.ones(dm)
            w[f"dm{i}_b2"] = np.zeros(dm)
        # PM heads on the 5 pyramid outputs
        pm_ins = (dm, dm, dm, dm, 16)
        for i in range(5):
            w[f"pm{i}_skip"] = _xavier(rng, (pm, pm_ins[i], 1, 1))
            for j in range(3):
                w[f"pm{i}_bone{j}"] = _xavier(rng, (pm, pm if j else pm_ins[i], 1, 1))
            w[f"pm{i}_conf"] = _xavier(rng, (k * 5, pm, 3, 3))
            w[f"pm{i}_loc"] = _xavier(rng, (k * 4, pm, 3, 3))
        # SegPred SMs on the 5 scales + tail
        for i, inc in enumerate(pm_ins):
            w[f"sm{i}_skip"] = _xavier(rng, (sm, inc, 1, 1))
            w[f"sm{i}_gs"] = np.ones(sm)
            w[f"sm{i}_bs"] = np.zeros(sm)
            for j in range(3):
                w[f"sm{i}_bone{j}"] = _xavier(rng, (sm, sm if j else inc, 1, 1))
                w[f"sm{i}_g{j}"] = np.ones(sm)
                w[f"sm{i}_b{j}"] = np.zeros(sm)
        w["tail_c0"] = _xavier(rng, (sm, sm, 1, 1))
        w["tail_g0"] = np.ones(sm)
        w["tail_b0"] = np.zeros(sm)
        w["tail_d1"] = _xavier(rng, (sm, sm, 2, 2))
        w["tail_c1"] = _xavier(rng, (sm, sm, 3, 3))
        w["tail_g1"] = np.ones(sm)
        w["tail_b1"] = np.zeros(sm)
        w["tail_d2"] = _xavier(rng, (sm, 4, 2, 2))
        self.weights = w
        self.dm_ch = dm
        self.sm_ch = sm

    def _dm(self, i: int, top: np.ndarray, lateral: np.ndarray) -> np.ndarray:
        w = self.weights
        x1 = deconv_s2_generic(top, w[f"dm{i}_dc"], 2, 2)
        x1 = batchnorm(conv2d(x1, w[f"dm{i}_dconv"], pad=1), w[f"dm{i}_g0"], w[f"dm{i}_b0"])
        x2 = relu(batchnorm(conv2d(lateral, w[f"dm{i}_cv0"], pad=1), w[f"dm{i}_g1"], w[f"dm{i}_b1"]))
        x2 = batchnorm(conv2d(x2, w[f"dm{i}_cv1"], pad=1), w[f"dm{i}_g2"], w[f"dm{i}_b2"])
        return relu(x1 * x2)  # the multiplicative gate (clrs.py:26-29)

    def _sm(self, i: int, x: np.ndarray, scale: int) -> np.ndarray:
        w = self.weights
        x1 = batchnorm(conv2d(x, w[f"sm{i}_skip"]), w[f"sm{i}_gs"], w[f"sm{i}_bs"])
        x2 = x
        for j in range(3):
            x2 = batchnorm(conv2d(x2, w[f"sm{i}_bone{j}"]), w[f"sm{i}_g{j}"], w[f"sm{i}_b{j}"])
            if j < 2:
                x2 = relu(x2)
        y = relu(x1 + x2)
        for _ in range(int(np.log2(scale))):
            y = nearest_up2(y)
        return y

    def forward(self, x: np.ndarray) -> dict:
        w = self.weights
        y = relu(conv2d(np.asarray(x, dtype=np.float64), w["stem"], stride=2, pad=1))
        feats = []
        for i in range(3):
            y = relu(conv2d(y, w[f"stage{i}"], stride=2, pad=1))
            feats.append(y)  # /4 /8 /16
        for i in range(2):
            y = relu(conv2d(y, w[f"extra{i}_c1"]))
            y = relu(conv2d(y, w[f"extra{i}_c3"], stride=2, pad=1))
            feats.append(y)  # /32 /64
        top = feats[-1]
        pyramid = [top]
        for i, lateral in enumerate(reversed(feats[:-1])):  # /32 /16 /8 /4
            top = self._dm(i, top, lateral)
            pyramid.append(top)
        pyramid = pyramid[::-1]  # finest → coarsest
        cls_preds, loc_preds = [], []
        for i, feat in enumerate(pyramid):
            x1 = conv2d(feat, w[f"pm{i}_skip"])
            x2 = feat
            for j in range(3):
                x2 = conv2d(x2, w[f"pm{i}_bone{j}"])
            fused = relu(x1 + x2)
            conf = conv2d(fused, w[f"pm{i}_conf"], pad=1)
            loc = conv2d(fused, w[f"pm{i}_loc"], pad=1)
            n = conf.shape[0]
            cls_preds.append(conf.transpose(0, 2, 3, 1).reshape(n, -1))
            loc_preds.append(loc.transpose(0, 2, 3, 1).reshape(n, -1))
        cls_preds = np.concatenate(cls_preds, axis=1).reshape(x.shape[0], -1, 5)
        loc_preds = np.concatenate(loc_preds, axis=1).reshape(x.shape[0], -1, 4)
        # SegPred over the pyramid, fused at the finest (/4) scale
        sm_feats = [self._sm(i, f, 2**i) for i, f in enumerate(pyramid)]
        fuse = relu(np.sum(sm_feats, axis=0))
        t = relu(batchnorm(conv2d(fuse, w["tail_c0"]), w["tail_g0"], w["tail_b0"]))
        t = deconv2x2_s2(t, w["tail_d1"])
        t = relu(batchnorm(conv2d(t, w["tail_c1"], pad=1), w["tail_g1"], w["tail_b1"]))
        seg_maps = sigmoid(deconv2x2_s2(t, w["tail_d2"]))
        return {"cls_preds": cls_preds, "loc_preds": loc_preds, "seg_maps": seg_maps}
