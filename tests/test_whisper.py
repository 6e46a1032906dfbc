"""JAX Whisper vs transformers (tiny random-init): mel frontend, encoder,
decoder logits, greedy tokens. N8-equivalent of the reference's
faster-whisper stage (data/production/distributed_whisperx.py:7-23)."""

import numpy as np
import pytest

import jax.numpy as jnp

from livecc_tpu.audio.mel import log_mel_spectrogram
from livecc_tpu.models.whisper import (
    WhisperConfig, convert_torch_model, greedy_transcribe_tokens,
    tiny_whisper_config, whisper_decode, whisper_encode,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_whisper_config()
    hf_cfg = transformers.WhisperConfig(
        vocab_size=cfg.vocab_size, num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads, decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim, decoder_ffn_dim=cfg.ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        eos_token_id=cfg.eos_token_id, bos_token_id=0, pad_token_id=0,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    params = convert_torch_model(model, cfg)
    return cfg, model, params


def _mel_input(cfg, seconds=0.4, seed=0):
    """Tiny mel: frames = 2 * max_source_positions (conv2 stride 2)."""
    rng = np.random.RandomState(seed)
    return rng.randn(cfg.num_mel_bins, 2 * cfg.max_source_positions).astype(np.float32)


def test_mel_frontend_parity():
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000 * 2) * 0.2).astype(np.float32)
    fe = transformers.WhisperFeatureExtractor(feature_size=128)
    ref = fe(audio, sampling_rate=16000, return_tensors="np")["input_features"][0]
    ours = log_mel_spectrogram(audio, num_mel_filters=128)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_encoder_parity(tiny):
    cfg, model, params = tiny
    mel = _mel_input(cfg)
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)[None]).last_hidden_state.numpy()
    ours = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel)[None]))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_decoder_logits_parity(tiny):
    cfg, model, params = tiny
    mel = _mel_input(cfg)
    ids = np.array([[cfg.decoder_start_token_id, 5, 9, 42]], np.int64)
    with torch.no_grad():
        out = model(input_features=torch.from_numpy(mel)[None],
                    decoder_input_ids=torch.from_numpy(ids))
        ref = out.logits.numpy()
    enc = whisper_encode(params, cfg, jnp.asarray(mel)[None])
    ours = np.asarray(whisper_decode(params, cfg, jnp.asarray(ids, jnp.int32), enc))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_whisper_transcriber_pipeline(tiny, tmp_path):
    """End-to-end ASR stage: WAV -> native audio decode -> mel -> greedy
    whisper -> word triples (tools/asr.py default transcriber)."""
    from livecc_tpu.tools.asr import WhisperTranscriber
    from livecc_tpu.vision_io import video_reader as vr

    if not vr.is_available():
        pytest.skip("native decoder unavailable")
    cfg, model, params = tiny
    ckpt = str(tmp_path / "whisper_tiny")
    model.save_pretrained(ckpt, safe_serialization=True)

    rng = np.random.RandomState(0)
    wav = str(tmp_path / "speech.wav")
    vr.encode_test_audio(wav, (rng.randn(16000) * 0.1).astype(np.float32), 16000)

    tr = WhisperTranscriber(ckpt, decode_text=lambda ids: " ".join(f"w{i}" for i in ids))
    # tiny model can't eat a real 30 s / 3000-frame mel: shrink the segment
    # to its source capacity by monkey-patching the frontend inputs
    import livecc_tpu.tools.asr as asr_mod
    from livecc_tpu.audio import mel as mel_mod

    orig = mel_mod.log_mel_spectrogram
    def small_mel(seg, num_mel_filters):
        out = orig(seg, num_mel_filters=num_mel_filters, pad_to_chunk=False)
        return out[:, : 2 * cfg.max_source_positions]
    try:
        import livecc_tpu.audio.mel
        livecc_tpu.audio.mel.log_mel_spectrogram = small_mel
        words = tr(wav)
    finally:
        livecc_tpu.audio.mel.log_mel_spectrogram = orig
    assert isinstance(words, list)
    for (t0, t1, w) in words:
        assert 0.0 <= t0 <= t1 and isinstance(w, str)
    # monotone non-overlapping spans
    for a, b in zip(words, words[1:]):
        assert a[1] <= b[0] + 1e-6


def test_greedy_tokens_match_hf_generate(tiny):
    cfg, model, params = tiny
    mel = _mel_input(cfg, seed=3)
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.from_numpy(mel)[None], max_new_tokens=8,
            do_sample=False, num_beams=1,
            decoder_input_ids=torch.tensor([[cfg.decoder_start_token_id]]),
        )[0].tolist()
    ours = greedy_transcribe_tokens(params, cfg, mel,
                                    prompt_ids=[cfg.decoder_start_token_id],
                                    max_new_tokens=8)
    # HF counts the prompt against max length; compare the common span
    n = min(len(ours), len(ref) - 1)
    assert n >= 6
    assert ours[:n] == ref[1:1 + n], (ours, ref)
