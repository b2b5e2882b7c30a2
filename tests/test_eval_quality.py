"""Quality-evaluation harness tests (tools/eval_quality.py).

Proves the metric math (mixed zh/en WER, cosine probes) and the full
harness loop on a tiny random-weight engine with the mock ASR backend —
the named driver metrics (zero-shot WER / speaker similarity) run the
moment a real ASR + real checkpoints are pointed at it."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import eval_quality  # noqa: E402
from test_engine_e2e import tiny_config  # noqa: E402

from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params  # noqa: E402


# ---------------------------------------------------------------------------
# WER math
# ---------------------------------------------------------------------------


def test_tokenize_mixed_script():
    toks = eval_quality.tokenize_for_wer("Hello, world! 共465篇")
    assert toks == ["hello", "world", "共", "465", "篇"]


def test_tokenize_normalizes_case_width_punct():
    a = eval_quality.tokenize_for_wer("It's 2.5%·done")
    b = eval_quality.tokenize_for_wer("it's 2.5% DONE")
    assert a == b == ["it's", "2", "5", "done"]


def test_edit_distance_known():
    assert eval_quality.edit_distance(list("abcd"), list("abcd")) == 0
    # substitution + deletion
    assert eval_quality.edit_distance(list("abcd"), list("axc")) == 2
    assert eval_quality.edit_distance([], list("ab")) == 2
    assert eval_quality.edit_distance(list("ab"), []) == 2


def test_wer_counts():
    err, n = eval_quality.wer_counts("a b c d", "a x c")
    assert (err, n) == (2, 4)
    # identical after normalization -> zero
    err, n = eval_quality.wer_counts("Hello World", "hello, world")
    assert (err, n) == (0, 2)


def test_mock_asr_exact_and_corrupted():
    exact = eval_quality.MockASR(drop=0.0)
    assert exact.transcribe(None, 0, ref_text="Hello world") == "Hello world"
    noisy = eval_quality.MockASR(drop=0.5, seed=1)
    hyp = noisy.transcribe(None, 0, ref_text="one two three four five six")
    err, n = eval_quality.wer_counts("one two three four five six", hyp)
    assert n == 6 and err > 0


def test_make_asr_rejects_unknown():
    with pytest.raises(ValueError):
        eval_quality.make_asr("nope")


def test_cosine_bounds():
    v = np.array([1.0, 2.0, 3.0])
    assert eval_quality.cosine(v, v) == pytest.approx(1.0)
    assert eval_quality.cosine(v, -v) == pytest.approx(-1.0)
    assert eval_quality.cosine(v, np.zeros(3)) == 0.0


# ---------------------------------------------------------------------------
# Full harness over a tiny engine
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config()
    return IndexTTS2Engine(cfg, random_params(cfg, seed=0))


@pytest.fixture(scope="module")
def prompt_wav(tmp_path_factory):
    from indextts_tpu.utils.audio import save_wav

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = tmp_path_factory.mktemp("eval") / "prompt.wav"
    save_wav(str(p), wav, 16000)
    return str(p)


def test_evaluate_mock_e2e(engine, prompt_wav, tmp_path):
    cases = [
        {"id": "plain", "text": "hello quality harness"},
        {"id": "emo_vec", "text": "excited words",
         "emo_vector": [0, 0, 0.8, 0, 0, 0, 0, 0]},
    ]
    result = eval_quality.evaluate(
        engine, cases, eval_quality.MockASR(drop=0.0),
        spk_audio=prompt_wav, seed=0, wav_dir=str(tmp_path / "wavs"),
    )
    agg = result["aggregate"]
    # exact mock ASR -> WER 0 by construction; probes must be finite cosines
    assert agg["wer"] == 0.0
    assert -1.0 <= agg["spk_sim_mean"] <= 1.0
    assert -1.0 <= agg["emo_sim_mean"] <= 1.0
    assert [r["emo_mode"] for r in result["cases"]] == ["neutral", "vector"]
    assert all(r["audio_dur_s"] > 0 for r in result["cases"])
    assert (tmp_path / "wavs" / "plain.wav").exists()


def test_evaluate_corrupted_asr_nonzero_wer(engine, prompt_wav):
    # byte-hash path: text must fit the tiny config's 32-token text cap
    cases = [{"id": "c", "text": "one two three four"}]
    result = eval_quality.evaluate(
        engine, cases, eval_quality.MockASR(drop=0.6, seed=3),
        spk_audio=prompt_wav, seed=0,
    )
    assert result["aggregate"]["wer"] > 0


def test_cli_writes_artifact(engine, prompt_wav, tmp_path, monkeypatch):
    """main() end-to-end: JSONL in, JSON artifact out (random weights)."""
    cases_path = tmp_path / "cases.jsonl"
    cases_path.write_text(json.dumps({"id": "x", "text": "tiny case"}) + "\n")
    out_path = tmp_path / "EVAL.json"

    # route the tool's engine construction to the tiny fixture
    import indextts_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "load_config", lambda *a, **k: engine.cfg)
    eval_quality.main([
        "--cases", str(cases_path), "--spk-audio", prompt_wav,
        "--asr", "mock", "--output", str(out_path),
    ])
    art = json.loads(out_path.read_text())
    assert art["meta"]["weights"] == "random"
    assert art["meta"]["asr"] == "mock"
    assert art["aggregate"]["wer"] == 0.0
    assert len(art["cases"]) == 1


def test_negative_controls_two_prompts(engine, prompt_wav, tmp_path):
    """VERDICT r4 #3: wrong-speaker and mismatched-emotion control rows.
    With two distinct prompts the cross speaker comes from the other case's
    prompt; margins and the discriminative flag land in the artifact."""
    from indextts_tpu.utils.audio import save_wav

    rng = np.random.default_rng(11)
    other = tmp_path / "other_prompt.wav"
    save_wav(str(other), (rng.standard_normal(16000) * 0.1).astype(np.float32),
             16000)
    cases = [
        {"id": "a", "text": "first speaker case"},
        {"id": "b", "text": "second speaker case", "spk_audio": str(other),
         "emo_vector": [0, 0, 0.8, 0, 0, 0, 0, 0]},
    ]
    result = eval_quality.evaluate(
        engine, cases, eval_quality.MockASR(drop=0.0),
        spk_audio=prompt_wav, seed=0,
    )
    c = result["controls"]
    assert len(c["spk"]) == 2
    for row in c["spk"]:
        assert row["margin"] == pytest.approx(row["same"] - row["cross"],
                                              abs=1e-6)
        # cross prompt differs from the row's own prompt
    assert c["spk"][0]["cross_prompt"] == str(other)
    assert c["spk"][1]["cross_prompt"] == prompt_wav
    assert c["spk_control_synthetic"] is False
    # differing emo targets (neutral vs vector) -> emo control rows exist
    assert "emo" in c and len(c["emo"]) == 2
    # the flags are present and honest (bool, matched to the margin)
    assert result["meta"]["spk_sim_discriminative"] == (
        c["spk_margin_mean"] >= 0.01
    )
    if not result["meta"]["spk_sim_discriminative"]:
        assert "measured nothing" in result["meta"]["spk_sim_note"]
    # cached flag: both rows used fresh prompts
    assert [r["cached"] for r in result["cases"]] == [False, False]


def test_negative_controls_single_prompt_synthetic(engine, prompt_wav):
    """One shared prompt: the wrong-speaker control falls back to a
    synthetic noise prompt and says so; identical neutral emo targets mean
    no emo control is constructible — also recorded."""
    cases = [
        {"id": "a", "text": "case one"},
        {"id": "b", "text": "case two"},
    ]
    result = eval_quality.evaluate(
        engine, cases, eval_quality.MockASR(drop=0.0),
        spk_audio=prompt_wav, seed=0,
    )
    c = result["controls"]
    assert c["spk_control_synthetic"] is True
    assert all(r["cross_prompt"] == "synthetic:noise" for r in c["spk"])
    assert "emo_note" in c and "emo" not in c
    # second case reused the cached prompt conditioning
    assert [r["cached"] for r in result["cases"]] == [False, True]
    assert "timing_note" in result["meta"]
