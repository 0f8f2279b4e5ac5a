"""AEC (acoustic echo cancellation) audio model — the second modality.

The reference ships ``AEC_T41_16K_NS_OUT_UC.mgk`` (27 layers:
Conv/GRU/BatchNorm int8) and runs it host-side via the Venus dlopen path;
its decompiler scripts rebuild it in PyTorch for verification
(``mgk-decompiler/scripts/aec_model.py``, ``aec_inference.py``).

Architecture (from the reference's RE notes, ``mgk-decompiler/
MGK_FORMAT.md``): spectrogram U-Net with a GRU bottleneck —
input [B, 256 freq, 8 frames, 1] -> encoder (1x1 expand + strided
freq downsample to 64 bins, 32 ch) -> GRU over frames (hidden 32,
state streamed across calls) -> decoder (upsample back to 256 bins)
-> sigmoid mask [B, 256, frames, 2].

TPU-native streaming: the GRU is a ``lax.scan`` carrying hidden state;
frame-to-frame state is an explicit carry returned to the caller (the
reference keeps it as a persistent device tensor,
``mgk-decompiler/scripts/aec_inference.py:5-12``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class AECConfig:
    freq_bins: int = 256
    frames: int = 8
    channels: int = 32
    hidden: int = 32
    out_channels: int = 2
    seed: int = 0


def gru_cell(x_t, h, w_ih, w_hh, b_ih, b_hh):
    """Standard GRU cell (torch gate order r,z,n — what the reference's
    PyTorch verification model uses, ``scripts/aec_model.py``)."""
    hs = h.shape[-1]
    gi = x_t @ w_ih + b_ih
    gh = h @ w_hh + b_hh
    i_r, i_z, i_n = gi[..., :hs], gi[..., hs:2 * hs], gi[..., 2 * hs:]
    h_r, h_z, h_n = gh[..., :hs], gh[..., hs:2 * hs], gh[..., 2 * hs:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(x, h0, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """GRU over axis 1 of x [B, T, C] via lax.scan -> ([B,T,H], h_T)."""
    def step(h, x_t):
        h = gru_cell(x_t, h, w_ih, w_hh, b_ih, b_hh)
        return h, h
    xs = jnp.swapaxes(x, 0, 1)          # [T, B, C]
    h_t, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h_t


def init_params(cfg: AECConfig) -> Dict[str, jnp.ndarray]:
    rng = np.random.default_rng(cfg.seed)
    c, h = cfg.channels, cfg.hidden

    def w(*shape, fan=None):
        fan = fan or shape[0]
        return jnp.asarray(
            rng.normal(0, 1.0 / np.sqrt(fan), shape).astype(np.float32))

    p = {
        "bn_in_scale": jnp.ones((1,), jnp.float32),
        "bn_in_bias": jnp.zeros((1,), jnp.float32),
        "enc_expand_w": w(1, 1, 1, c),          # HWIO 1x1: 1 -> C
        "enc_expand_b": jnp.zeros((c,), jnp.float32),
        "enc_down1_w": w(2, 1, c, c, fan=2 * c),
        "enc_down1_b": jnp.zeros((c,), jnp.float32),
        "enc_conv1_w": w(1, 1, c, c, fan=c),
        "enc_conv1_b": jnp.zeros((c,), jnp.float32),
        "enc_down2_w": w(2, 1, c, c, fan=2 * c),
        "enc_down2_b": jnp.zeros((c,), jnp.float32),
        "enc_conv2_w": w(1, 1, c, c, fan=c),
        "enc_conv2_b": jnp.zeros((c,), jnp.float32),
        "bn_pre_scale": jnp.ones((c,), jnp.float32),
        "bn_pre_bias": jnp.zeros((c,), jnp.float32),
        "gru1_w_ih": w(c, 3 * h, fan=c),
        "gru1_w_hh": w(h, 3 * h, fan=h),
        "gru1_b_ih": jnp.zeros((3 * h,), jnp.float32),
        "gru1_b_hh": jnp.zeros((3 * h,), jnp.float32),
        "gru2f_w_ih": w(h, 3 * h, fan=h),
        "gru2f_w_hh": w(h, 3 * h, fan=h),
        "gru2f_b_ih": jnp.zeros((3 * h,), jnp.float32),
        "gru2f_b_hh": jnp.zeros((3 * h,), jnp.float32),
        "gru2b_w_ih": w(h, 3 * h, fan=h),
        "gru2b_w_hh": w(h, 3 * h, fan=h),
        "gru2b_b_ih": jnp.zeros((3 * h,), jnp.float32),
        "gru2b_b_hh": jnp.zeros((3 * h,), jnp.float32),
        "dec_conv1_w": w(1, 1, 2 * h, c, fan=2 * h),
        "dec_conv1_b": jnp.zeros((c,), jnp.float32),
        "dec_up1_w": w(2, 1, c, c, fan=2 * c),     # freq x2 via repeat+conv
        "dec_up1_b": jnp.zeros((c,), jnp.float32),
        "dec_up2_w": w(2, 1, c, c, fan=2 * c),
        "dec_up2_b": jnp.zeros((c,), jnp.float32),
        "dec_out_w": w(1, 1, c, cfg.out_channels, fan=c),
        "dec_out_b": jnp.zeros((cfg.out_channels,), jnp.float32),
    }
    return p


def _conv(x, w, b, stride=(1, 1)):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def init_state(cfg: AECConfig, batch: int = 1) -> jnp.ndarray:
    """Streaming GRU hidden state (the reference's persistent
    [64,1,1,32] hidden tensor -> [B, freq_bins/4, hidden] here)."""
    return jnp.zeros((batch, cfg.freq_bins // 4, cfg.hidden), jnp.float32)


def forward(
    params: Dict[str, jnp.ndarray],
    spec: jnp.ndarray,                   # [B, 256, T, 1] f32 spectrogram
    state: Optional[jnp.ndarray] = None,
    cfg: AECConfig = AECConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming step: spectrogram frames -> sigmoid mask + new state.

    Layout: NHWC with H=freq, W=time. The GRU runs per-frequency-bin over
    the time axis; ``state`` is carried across calls (streaming).
    """
    b, fbins, t, _ = spec.shape
    p = params
    if state is None:
        state = init_state(cfg, b)

    x = spec * p["bn_in_scale"] + p["bn_in_bias"]
    x = jax.nn.relu(_conv(x, p["enc_expand_w"], p["enc_expand_b"]))
    x = jax.nn.relu(_conv(x, p["enc_down1_w"], p["enc_down1_b"],
                          stride=(2, 1)))                       # 128 bins
    x = jax.nn.relu(_conv(x, p["enc_conv1_w"], p["enc_conv1_b"]))
    x = jax.nn.relu(_conv(x, p["enc_down2_w"], p["enc_down2_b"],
                          stride=(2, 1)))                       # 64 bins
    skip = jax.nn.relu(_conv(x, p["enc_conv2_w"], p["enc_conv2_b"]))
    x = skip * p["bn_pre_scale"] + p["bn_pre_bias"]

    # GRU over time, vmapped over frequency bins: [B, F, T, C] -> rows
    bq = x.shape[1]
    xg = x.reshape(b * bq, t, cfg.channels)
    h0 = state.reshape(b * bq, cfg.hidden)
    y1, h1 = gru_scan(xg, h0, p["gru1_w_ih"], p["gru1_w_hh"],
                      p["gru1_b_ih"], p["gru1_b_hh"])
    # bidirectional second GRU (bottleneck)
    z0 = jnp.zeros_like(h0)
    yf, _ = gru_scan(y1, z0, p["gru2f_w_ih"], p["gru2f_w_hh"],
                     p["gru2f_b_ih"], p["gru2f_b_hh"])
    yb, _ = gru_scan(y1, z0, p["gru2b_w_ih"], p["gru2b_w_hh"],
                     p["gru2b_b_ih"], p["gru2b_b_hh"], reverse=True)
    y = jnp.concatenate([yf, yb], axis=-1)
    y = y.reshape(b, bq, t, 2 * cfg.hidden)

    y = jax.nn.relu(_conv(y, p["dec_conv1_w"], p["dec_conv1_b"]))
    y = y + skip                                              # U-Net skip
    y = jnp.repeat(y, 2, axis=1)                              # 128 bins
    y = jax.nn.relu(_conv(y, p["dec_up1_w"], p["dec_up1_b"]))
    y = jnp.repeat(y, 2, axis=1)                              # 256 bins
    y = jax.nn.relu(_conv(y, p["dec_up2_w"], p["dec_up2_b"]))
    mask = jax.nn.sigmoid(_conv(y, p["dec_out_w"], p["dec_out_b"]))
    new_state = h1.reshape(b, bq, cfg.hidden)
    return mask, new_state


def process_stream(
    params: Dict[str, jnp.ndarray],
    spec_frames: jnp.ndarray,            # [B, 256, total_T, 1]
    chunk: int = 8,
    cfg: AECConfig = AECConfig(),
) -> jnp.ndarray:
    """Streamed inference over a long spectrogram in ``chunk``-frame hops
    with carried GRU state (one outer lax.scan — the whole stream is a
    single XLA program; the reference processes chunk-by-chunk from host,
    ``scripts/aec_inference.py``)."""
    b, fbins, total_t, c = spec_frames.shape
    n = total_t // chunk
    xs = spec_frames[:, :, :n * chunk].reshape(b, fbins, n, chunk, c)
    xs = jnp.moveaxis(xs, 2, 0)          # [n, B, F, chunk, C]

    def step(state, x):
        mask, state = forward(params, x, state, cfg)
        return state, mask

    _, masks = jax.lax.scan(step, init_state(cfg, b), xs)
    masks = jnp.moveaxis(masks, 0, 2)    # [B, F, n, chunk, 2]
    return masks.reshape(b, fbins, n * chunk, cfg.out_channels)


def make_stream_scanner(graph):
    """One-program streaming runner for the DECOMPILED streaming graph
    (``formats.mgk.import_mgk(streaming=True)``).

    Returns ``run(h0, windows)``: a jitted ``lax.scan`` over
    ``windows [W, 1, 256, 8]`` with the gru1 hidden state as carry —
    the whole stream is ONE XLA program (vs :class:`AECStream`'s
    per-window host loop, the reference's ``aec_inference.py`` shape),
    ``vmap``-wrapped over a leading stream axis so N independent
    streams run concurrently: ``run(h0[S,1,64,32],
    windows[W,S,1,256,8]) -> masks [W,S,1,256,2]``. Matches
    AECStream.run window-for-window (tests/test_audio.py).
    """
    from thingino_accel_tpu.runtime import Engine

    eng = Engine(graph)
    body, params = eng._fn, eng.params
    in_name = graph.inputs[0]
    h_in = next(i for i in graph.inputs if "h0" in i)
    outs = list(graph.outputs)
    mask_out = "output" if "output" in outs else outs[0]
    h_out = next(o for o in outs if "Y_h" in o)

    def step(h, x):
        out = body(params, {in_name: x, h_in: h})
        return out[h_out], out[mask_out]

    def one_stream(h0, wins):
        _, masks = jax.lax.scan(step, h0, wins)
        return masks

    return jax.jit(jax.vmap(one_stream, in_axes=(0, 1), out_axes=1))


def try_attach_mgk_weights(
    params: Dict[str, jnp.ndarray], weights_blob: bytes
) -> Dict[str, jnp.ndarray]:
    """Attach GRU weights extracted from the `.mgk` blob at the offsets
    documented by the reference's RE (``MGK_FORMAT.md``: unidirectional
    GRU at 0x220c0, bidirectional at 0x0). Conv regions need per-layer
    attribution work; until then they keep their init values. int8 blocks
    are dequantized with a nominal scale."""
    from thingino_accel_tpu.formats.mgk import (
        AEC_WEIGHT_OFFSETS, unpack_gru_blocks,
    )
    out = dict(params)
    scale = np.float32(1.0 / 64.0)

    def fit(arr: np.ndarray, shape) -> np.ndarray:
        tiled = np.tile(arr, (max(1, -(-shape[0] // arr.shape[0])),
                              max(1, -(-shape[1] // arr.shape[1]))))
        return tiled[:shape[0], :shape[1]]

    off, size = AEC_WEIGHT_OFFSETS["layer_37_gru"]
    if len(weights_blob) >= off + size:
        uni = unpack_gru_blocks(weights_blob[off:off + size], False)
        w_ih = uni["w_ih"].astype(np.float32) * scale      # [64, 32]
        w_hh = uni["w_hh"].astype(np.float32) * scale
        out["gru1_w_ih"] = jnp.asarray(
            fit(w_ih, out["gru1_w_ih"].shape))
        out["gru1_w_hh"] = jnp.asarray(
            fit(w_hh, out["gru1_w_hh"].shape))

    off, size = AEC_WEIGHT_OFFSETS["layer_46_gru_bidir"]
    if len(weights_blob) >= off + size:
        bi = unpack_gru_blocks(weights_blob[off:off + size], True)
        for d, pfx in (("fwd", "gru2f"), ("bwd", "gru2b")):
            w_i = np.concatenate(
                [bi[f"{d}_w_ir"], bi[f"{d}_w_iz"], bi[f"{d}_w_in"]],
                axis=1).astype(np.float32) * scale        # [32, 96]
            w_h = np.concatenate(
                [bi[f"{d}_w_hr"], bi[f"{d}_w_hz"], bi[f"{d}_w_hn"]],
                axis=1).astype(np.float32) * scale
            out[f"{pfx}_w_ih"] = jnp.asarray(
                fit(w_i, out[f"{pfx}_w_ih"].shape))
            out[f"{pfx}_w_hh"] = jnp.asarray(
                fit(w_h, out[f"{pfx}_w_hh"].shape))
    return out


def build_aec_graph(weights_blob: bytes = b"", meta=None):
    """`.mgk` import entry: returns a callable model object (not a layer
    IR graph — the GRU's scan carry doesn't fit the flat tensor IR; this
    mirrors how the reference treats .mgk models as opaque executables,
    minus executing their code)."""
    cfg = AECConfig()
    params = init_params(cfg)
    if weights_blob:
        params = try_attach_mgk_weights(params, weights_blob)
    return AECModel(cfg, params)


class AECModel:
    """Engine-like wrapper: jitted streaming forward with state."""

    def __init__(self, cfg: AECConfig, params: Dict[str, jnp.ndarray]):
        self.cfg = cfg
        self.params = params
        self._fwd = jax.jit(lambda p, x, s: forward(p, x, s, cfg))

    def run(self, spec: np.ndarray, state=None):
        spec = jnp.asarray(spec, jnp.float32)
        if spec.ndim == 3:
            spec = spec[..., None]
        if state is None:
            state = init_state(self.cfg, spec.shape[0])
        mask, new_state = self._fwd(self.params, spec, state)
        return np.asarray(mask), new_state

    # engine-compat introspection used by api.Model
    @property
    def graph(self):
        raise AttributeError("AEC .mgk models use the streaming API")


class AECStream:
    """Streaming wrapper over the DECOMPILED `.mgk` graph (real weights,
    ``formats.mgk.import_mgk(streaming=True)``).

    Carries gru1's hidden state across 8-frame windows — the recurrence
    the reference streams in ``scripts/aec_inference.py`` (its
    ``[64,1,1,32]`` hidden state); gru2 is bidirectional within the
    window and resets per step, matching the reference's behavior.
    Each ``run`` consumes one [B, 256, 8] log1p-magnitude window and
    returns the [B, 256, 2] sigmoid mask for the window's last frame.
    """

    def __init__(self, graph):
        from thingino_accel_tpu.runtime import Engine
        self.graph = graph
        self.engine = Engine(graph)
        self._in = graph.inputs[0]
        self._h_in = next((i for i in graph.inputs if "h0" in i), None)
        outs = list(graph.outputs)
        self._mask_out = "output" if "output" in outs else None
        self._h_out = next((o for o in outs if "Y_h" in o), None)
        if None in (self._h_in, self._mask_out, self._h_out):
            raise ValueError(
                "streaming AEC graph must expose 'h0' input, 'output' "
                f"and 'Y_h' outputs (got inputs={graph.inputs}, "
                f"outputs={outs}) — import with streaming=True")

    def init_state(self) -> np.ndarray:
        shape = self.graph.tensors[self._h_in].shape
        return np.zeros(shape, np.float32)

    def run(self, window: np.ndarray, state=None):
        if state is None:
            state = self.init_state()
        out = self.engine.run(**{self._in: np.asarray(window, np.float32),
                                 self._h_in: state})
        return np.asarray(out[self._mask_out]), out[self._h_out]
