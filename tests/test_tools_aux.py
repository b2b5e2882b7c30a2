"""Ancillary tools: voice-conditioning prep, transcript generation, i18n."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from indextts_tpu.utils.audio import load_wav, save_wav  # noqa: E402


def test_voice_conditioning_prepare(tmp_path):
    from tools.voice_conditioning import main

    d = tmp_path / "clips"
    d.mkdir()
    sr = 16000
    rng = np.random.default_rng(0)
    # one loud clip, one quiet clip, one mostly-silent clip
    save_wav(str(d / "loud.wav"), np.sin(np.linspace(0, 800, sr)) * 0.7, sr)
    save_wav(str(d / "quiet.wav"), np.sin(np.linspace(0, 800, sr)) * 0.05, sr)
    sil = np.zeros(sr, np.float32)
    sil[:100] = 0.3
    save_wav(str(d / "silent.wav"), sil, sr)
    out = tmp_path / "combined.wav"
    rc = main([
        "prepare", "--input-dir", str(d), "--output", str(out),
        "--target-duration", "1.5", "--sample-rate", str(sr),
    ])
    assert rc == 0
    audio, got_sr = load_wav(str(out))
    assert got_sr == sr
    assert 0 < len(audio) <= int(1.5 * sr)
    # peak-normalized to about -1 dBFS
    assert 0.8 < np.abs(audio).max() <= 1.0


def test_voice_conditioning_quality_score():
    from tools.voice_conditioning import quality_score

    loud = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.7
    silent = np.zeros(8000, np.float32)
    assert quality_score(loud, 16000)["score"] > quality_score(silent, 16000)["score"]


def test_voice_conditioning_precompute_roundtrip(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params
    from tools.voice_conditioning import load_precomputed_speaker

    cfg = tiny_config()
    engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    wav = (np.random.default_rng(3).standard_normal(16000) * 0.1).astype(np.float32)
    spk = engine.prepare_speaker(wav, 16000)
    out = tmp_path / "spk.npz"
    np.savez(
        out,
        spk_cond_emb=np.asarray(spk.spk_cond_emb),
        cond_len=np.asarray(spk.cond_len),
        style=np.asarray(spk.style),
        prompt_condition=np.asarray(spk.prompt_condition),
        ref_mel=np.asarray(spk.ref_mel),
        ref_mel_len=np.asarray(spk.ref_mel_len),
        spk_latents=np.asarray(spk.spk_latents),
    )
    back = load_precomputed_speaker(str(out))
    assert back.cond_len == spk.cond_len
    assert back.ref_mel_len == spk.ref_mel_len
    np.testing.assert_array_equal(np.asarray(back.style), np.asarray(spk.style))
    # a loaded bundle drives synthesis identically to the fresh one
    seg = np.random.default_rng(4).integers(2, 50, 7)
    emo = engine.prepare_emotion(wav, 16000)
    r1 = engine.synthesize_segment(spk, emo, seg, seed=0)
    r2 = engine.synthesize_segment(back, emo, seg, seed=0)
    np.testing.assert_array_equal(np.asarray(r1.wav), np.asarray(r2.wav))


def test_generate_transcripts(tmp_path):
    from tools.generate_transcripts import main

    audio_dir = tmp_path / "wavs"
    audio_dir.mkdir()
    for i in range(3):
        save_wav(str(audio_dir / f"tars_{i:03d}.wav"),
                 np.zeros(1600, np.float32), 16000)
    src = tmp_path / "src.jsonl"
    with open(src, "w") as f:
        for i in range(2):  # one wav intentionally missing source text
            f.write(json.dumps({"id": f"tars_{i:03d}", "text": f"line {i}"}) + "\n")
    man = tmp_path / "manifest.jsonl"
    with open(man, "w") as f:
        f.write(json.dumps({"path": "wavs/tars_000.wav", "duration": 2.5}) + "\n")
    rc = main([
        "--source-jsonl", str(src), "--manifest", str(man),
        "--audio-dir", str(audio_dir),
    ])
    assert rc == 0
    t0 = json.loads((audio_dir / "tars_000.json").read_text())
    assert t0["segments"][0]["end"] == 2.5
    assert t0["segments"][0]["text"] == "line 0"
    t1 = json.loads((audio_dir / "tars_001.json").read_text())
    assert t1["segments"][0]["end"] == 5.0  # default duration
    assert not (audio_dir / "tars_002.json").exists()


def test_i18n_translation_and_fallback():
    from indextts_tpu.utils.i18n import I18nAuto, scan_language_list

    assert "zh_CN" in scan_language_list() and "en_US" in scan_language_list()
    zh = I18nAuto("zh_CN")
    assert zh("Text") == "文本"
    assert zh("totally unknown key") == "totally unknown key"
    en = I18nAuto("nonexistent_LOCALE")
    assert en.language == "en_US"
    assert en("Text") == "Text"


def test_webui_render_localized():
    from indextts_tpu.runtime.webui import UI_HTML, render_ui

    en = render_ui("en_US")
    assert en == UI_HTML
    zh = render_ui("zh_CN")
    assert "文本" in zh and "合成" in zh
    # ids / JS identifiers untouched
    assert 'getElementById("text")' in zh
    assert 'id="temperature"' in zh


def test_synthesize_clips_make_input(tmp_path):
    from tools.synthesize_clips import main

    out = tmp_path / "input.jsonl"
    assert main(["make-input", "--output", str(out), "--count", "5",
                 "--shuffle", "--seed", "3"]) == 0
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 5
    assert all({"id", "text"} <= set(r) for r in rows)
    # ids are unique, slug-style
    assert len({r["id"] for r in rows}) == 5
    assert all(r["id"].startswith("clip_") for r in rows)
    # custom phrase file wins over the built-in bank
    phr = tmp_path / "p.txt"
    phr.write_text("Hello there.\nGeneral greeting.\n")
    assert main(["make-input", "--output", str(out), "--count", "10",
                 "--phrases", str(phr)]) == 0
    rows = [json.loads(l) for l in open(out)]
    assert [r["text"] for r in rows] == ["Hello there.", "General greeting."]


def test_synthesize_clips_synth(tmp_path, monkeypatch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine_e2e import tiny_config

    import indextts_tpu.config as config_mod
    from tools.synthesize_clips import main

    monkeypatch.setattr(config_mod, "load_config", lambda *a, **k: tiny_config())

    ref = tmp_path / "ref.wav"
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    save_wav(str(ref), wav, 16000)
    inp = tmp_path / "in.jsonl"
    with open(inp, "w") as f:
        f.write(json.dumps({"id": "a_001", "text": "Hold position."}) + "\n")
        f.write(json.dumps({"id": "a_002", "text": "Confirmed. Executing."}) + "\n")
    out_dir = tmp_path / "clips"
    assert main(["synth", "--input", str(inp), "--reference", str(ref),
                 "--output-dir", str(out_dir), "--max-samples", "2"]) == 0
    man = json.load(open(out_dir / "manifest.json"))
    assert man["total_clips"] == 2
    for row in man["clips"]:
        assert (out_dir / row["path"]).exists()
        assert row["duration"] > 0
