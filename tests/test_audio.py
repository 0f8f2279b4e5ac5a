"""Audio front-end tests: WAV IO, STFT/iSTFT round trip, AEC processing
on the real reference fixtures."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from thingino_accel_tpu.models import aec, audio

SAMPLES = "/root/reference/mgk-decompiler/audio_samples"
needs_samples = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="audio fixtures not available")


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.normal(size=16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio.write_wav(p, x)
    back = audio.read_wav(p)
    assert back.shape == x.shape
    np.testing.assert_allclose(back, x, atol=1.0 / 32768 + 1e-6)


def test_stft_istft_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 16384)).astype(np.float32) * 0.3)
    spec = audio.stft(x)
    assert spec.shape[1] == audio.FREQ_BINS
    back = audio.istft(spec, n_samples=16384)
    # perfect reconstruction except frame edges & the dropped top bin
    mid = slice(audio.N_FFT, 16384 - audio.N_FFT)
    err = np.abs(np.asarray(back)[0, mid] - np.asarray(x)[0, mid])
    assert err.mean() < 0.02


@needs_samples
def test_aec_on_real_wav(tmp_path):
    wavs = sorted(f for f in os.listdir(SAMPLES) if f.endswith("_mic.wav"))
    x = audio.read_wav(os.path.join(SAMPLES, wavs[0]))[:32000]  # 2s
    model = aec.AECModel(aec.AECConfig(), aec.init_params(aec.AECConfig()))
    out = audio.process_wav(model, x)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.5
    audio.write_wav(str(tmp_path / "processed.wav"), out)
    assert (tmp_path / "processed.wav").exists()


@needs_samples
def test_aec_full_pipeline_from_mgk(tmp_path):
    """The aec_inference.py flow: .mgk decompile -> real WAV -> masked
    WAV, with gru1 state carried across sliding 8-frame windows."""
    from thingino_accel_tpu.formats import mgk
    from thingino_accel_tpu.models.aec import AECStream
    path = "/root/reference/AEC_T41_16K_NS_OUT_UC.mgk"
    if not os.path.exists(path):
        pytest.skip("AEC .mgk absent")
    stream = AECStream(mgk.import_mgk(path, streaming=True))
    wavs = sorted(f for f in os.listdir(SAMPLES) if f.endswith("_mic.wav"))
    x = audio.read_wav(os.path.join(SAMPLES, wavs[0]))[:8000]  # 0.5s
    out = audio.process_wav_stream(stream, x)
    assert out.shape == x.shape and np.isfinite(out).all()
    assert np.abs(out).max() <= 1.5


def test_stft_matmul_matches_fft(rng):
    """The matmul real-DFT (TPU-servable, no complex dtype) must match
    jnp.fft.rfft numerically."""
    x = jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32) * 0.5)
    re, im = audio.stft_ri(x)
    # fft oracle over the same framing
    frames = np.asarray(audio._frames(x))
    spec = np.fft.rfft(frames, axis=-1)[..., :audio.FREQ_BINS]
    np.testing.assert_allclose(np.asarray(re),
                               np.swapaxes(spec.real, 1, 2),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(im),
                               np.swapaxes(spec.imag, 1, 2),
                               atol=2e-3)


def test_istft_ri_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 16384)).astype(np.float32) * 0.3)
    re, im = audio.stft_ri(x)
    back = audio.istft_ri(re, im, n_samples=16384)
    xin = np.asarray(x)[0][audio.N_FFT:-audio.N_FFT]
    got = np.asarray(back)[0][audio.N_FFT:-audio.N_FFT]
    # same bound as the complex-path roundtrip: reconstruction is
    # perfect except the dropped Nyquist bin's white-noise energy
    assert np.abs(got - xin).mean() < 0.02


AEC_MGK = "/root/reference/AEC_T41_16K_NS_OUT_UC.mgk"


@pytest.mark.skipif(not os.path.exists(AEC_MGK),
                    reason="AEC .mgk not available")
def test_stream_scanner_matches_step_loop(rng):
    """make_stream_scanner (one lax.scan program, vmap over streams) ==
    AECStream.run window-by-window on the decompiled real-weight graph."""
    from thingino_accel_tpu.formats.mgk import import_mgk

    g = import_mgk(AEC_MGK, streaming=True)
    run = aec.make_stream_scanner(g)
    W, S = 5, 2
    wins = np.abs(rng.normal(size=(W, S, 1, 256, 8))).astype(np.float32)
    h0 = np.zeros((S, 1, 64, 32), np.float32)
    masks = np.asarray(run(jnp.asarray(h0), jnp.asarray(wins)))
    assert masks.shape == (W, S, 1, 256, 2)

    stream = aec.AECStream(g)
    for s in range(S):
        state = None
        for w in range(W):
            m, state = stream.run(wins[w, s], state)
            np.testing.assert_allclose(masks[w, s], m, atol=2e-5)
