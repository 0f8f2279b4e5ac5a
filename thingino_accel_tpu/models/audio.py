"""Audio front-end for the AEC model: WAV IO, STFT/iSTFT, streaming
processing.

The reference handles this host-side in Python around onnxruntime
(``mgk-decompiler/scripts/aec_inference.py`` frame/window/mask/overlap-
add, ``process_audio.py``); here the spectral transform and mask
application are jax (device-side, fused with the model), and WAV IO is
stdlib (16 kHz mono 16-bit PCM, the AEC fixture format).
"""

from __future__ import annotations

import wave
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 512
HOP = 256
FREQ_BINS = 256     # model consumes bins 0..255 of the 257-bin rfft


def read_wav(path: str, expect_rate: int = SAMPLE_RATE) -> np.ndarray:
    """16-bit PCM mono WAV -> float32 [-1, 1].

    ``expect_rate``: the AEC pipeline's STFT constants assume 16 kHz —
    a mismatched file would be processed at the wrong frame rate and
    written back slowed down, silently. Pass None to skip the check."""
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "16-bit PCM expected"
        if expect_rate is not None and w.getframerate() != expect_rate:
            raise ValueError(
                f"{path}: sample rate {w.getframerate()} != "
                f"{expect_rate} (resample first, or pass "
                "expect_rate=None)")
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels())[:, 0]
    return (data.astype(np.float32) / 32768.0).copy()


def write_wav(path: str, audio: np.ndarray,
              rate: int = SAMPLE_RATE) -> None:
    pcm = np.clip(np.asarray(audio) * 32768.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def _window() -> jnp.ndarray:
    return jnp.hanning(N_FFT).astype(jnp.float32)


def _dft_mats() -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real-DFT analysis matrices [N_FFT, FREQ_BINS] (cos, -sin)."""
    n = np.arange(N_FFT)[:, None]
    k = np.arange(FREQ_BINS)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(-np.sin(ang), jnp.float32))


def _idft_mats() -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real-iDFT synthesis matrices [FREQ_BINS, N_FFT]: x[n] =
    (1/N) * sum_k alpha_k (re_k cos - im_k sin), alpha = 1 for k=0,
    2 for 0<k<N/2 (bin N/2 is dropped — the model zeroes it)."""
    k = np.arange(FREQ_BINS)[:, None]
    n = np.arange(N_FFT)[None, :]
    ang = 2.0 * np.pi * k * n / N_FFT
    alpha = np.where(k == 0, 1.0, 2.0) / N_FFT
    return (jnp.asarray(alpha * np.cos(ang), jnp.float32),
            jnp.asarray(-alpha * np.sin(ang), jnp.float32))


def _frames(x: jax.Array) -> jax.Array:
    b, n = x.shape
    t = max(0, (n - N_FFT) // HOP + 1)
    idx = (jnp.arange(t)[:, None] * HOP + jnp.arange(N_FFT)[None, :])
    return x[:, idx] * _window()[None, None, :]          # [B, T, N_FFT]


def stft_ri(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, samples] -> (re, im) spectrograms [B, FREQ_BINS, T].

    Real matmul DFT (512-point, tiny) instead of ``jnp.fft.rfft``: the
    tunneled TPU runtime has no complex-dtype ops, and a real-valued
    formulation keeps the whole AEC pipeline one device program."""
    frames = _frames(x)
    cm, sm = _dft_mats()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nk->btk", frames, cm, precision=hi)
    im = jnp.einsum("btn,nk->btk", frames, sm, precision=hi)
    return jnp.swapaxes(re, 1, 2), jnp.swapaxes(im, 1, 2)


def stft(x: jax.Array) -> jax.Array:
    """[B, samples] -> complex spectrogram [B, FREQ_BINS, T] (host/CPU
    convenience wrapper over :func:`stft_ri`)."""
    re, im = stft_ri(x)
    return jax.lax.complex(re, im)


def istft_ri(re: jax.Array, im: jax.Array,
             n_samples: Optional[int] = None) -> jax.Array:
    """(re, im) [B, f<=FREQ_BINS, T] -> [B, samples] via matmul iDFT +
    overlap-add. Complex-free (TPU-servable). Inputs with fewer than
    FREQ_BINS rows are zero-padded to the full spectrum (the irfft
    path's old contract)."""
    b, f, t = re.shape
    if f == FREQ_BINS + 1:
        # full 257-bin rfft: the synthesis covers bins 0..255 (the
        # model never emits the nyquist bin) — drop it
        re, im = re[:, :FREQ_BINS], im[:, :FREQ_BINS]
    elif f < FREQ_BINS:
        re = jnp.pad(re, ((0, 0), (0, FREQ_BINS - f), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, FREQ_BINS - f), (0, 0)))
    elif f > FREQ_BINS:
        raise ValueError(f"istft_ri expects <= {FREQ_BINS + 1} bins, got {f}")
    icm, ism = _idft_mats()
    hi = jax.lax.Precision.HIGHEST
    frames = (jnp.einsum("bft,fn->btn", re, icm, precision=hi)
              + jnp.einsum("bft,fn->btn", im, ism, precision=hi))
    frames = frames * _window()[None, None, :]
    return _overlap_add(frames, n_samples)


def istft(spec: jax.Array, n_samples: Optional[int] = None) -> jax.Array:
    """[B, FREQ_BINS, T] complex -> [B, samples] via overlap-add."""
    return istft_ri(jnp.real(spec), jnp.imag(spec), n_samples)


def _overlap_add(frames: jax.Array,
                 n_samples: Optional[int]) -> jax.Array:
    b, t, _ = frames.shape
    out_len = (t - 1) * HOP + N_FFT
    out = jnp.zeros((b, out_len), jnp.float32)
    norm = jnp.zeros((out_len,), jnp.float32)
    win_sq = _window() ** 2
    idx = jnp.arange(t)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    out = out.at[:, idx.reshape(-1)].add(
        frames.reshape(b, -1))
    norm = norm.at[idx.reshape(-1)].add(
        jnp.tile(win_sq, (t,)))
    # floor the OLA normalizer: at the first/last hops only a window
    # tail covers each sample, and dividing masked (inconsistent)
    # frames by a near-zero window-sum amplifies edge residuals by
    # orders of magnitude — attenuate edges instead of exploding them
    out = out / jnp.maximum(norm, 1e-2)[None, :]
    if n_samples is not None:
        if out.shape[1] < n_samples:      # tail beyond the last full frame
            out = jnp.pad(out, ((0, 0), (0, n_samples - out.shape[1])))
        out = out[:, :n_samples]
    return out


def process_wav(model, audio: np.ndarray, chunk: int = 8) -> np.ndarray:
    """Run the AEC mask model over a waveform: stft -> chunked streaming
    mask (carried GRU state) -> apply -> istft. ``model`` is an
    ``models.aec.AECModel``."""
    x = jnp.asarray(audio[None])
    re, im = stft_ri(x)                                  # [1, 256, T] x2
    mag = jnp.log1p(jnp.sqrt(re * re + im * im))
    t = re.shape[2]
    n_chunks = t // chunk
    state = None
    masks = []
    for i in range(n_chunks):
        m, state = model.run(
            np.asarray(mag[:, :, i * chunk:(i + 1) * chunk]), state)
        masks.append(m[..., 0])                          # channel 0 = mask
    if not masks:
        return np.asarray(audio)
    mask = jnp.asarray(np.concatenate(masks, axis=2))    # [1, 256, T']
    t_used = mask.shape[2]
    out = istft_ri(re[:, :, :t_used] * mask, im[:, :, :t_used] * mask,
                   n_samples=len(audio))
    return np.asarray(out[0])


def process_wav_stream(stream, audio: np.ndarray) -> np.ndarray:
    """Streaming AEC over a waveform with the decompiled `.mgk` model
    (``models.aec.AECStream``): sliding 8-frame log1p-magnitude window
    -> per-window [256, 2] mask, channel 0 applied to the window's LAST
    frame, hop-overlap-add — the reference's ``scripts/aec_inference.py``
    application semantics."""
    x = jnp.asarray(audio[None])
    re, im = stft_ri(x)                             # [1, 256, T] x2
    mag = np.asarray(jnp.log1p(jnp.sqrt(re * re + im * im)), np.float32)
    t = re.shape[2]
    n_frames = 8
    if t < n_frames:
        return np.asarray(audio)
    state = None
    mask_frames = np.ones((1, FREQ_BINS, t), np.float32)
    for i in range(t - n_frames + 1):
        window = mag[:, :, i:i + n_frames]
        m, state = stream.run(window, state)        # [1, 256, 2]
        mask_frames[:, :, i + n_frames - 1] = m[0, :, 0]
    mk = jnp.asarray(mask_frames)
    out = istft_ri(re * mk, im * mk, n_samples=len(audio))
    return np.asarray(out[0])
