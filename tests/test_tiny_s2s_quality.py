"""End-to-end S2S quality gate on the trained tiny system (VERDICT r3 #4).

The checkpoint in `freeze_omni_tpu/assets/tiny_s2s` is produced by
`scripts/train_tiny_s2s.py` (full curriculum on the closed 16-word
synthetic audio-language). This test re-runs the three SHIPPED harnesses
against it on freshly generated held-out audio and asserts the scores are
materially better than chance — a sign-flip anywhere in the audio front
end, the chat-template splice, the frozen-LLM alignment, the codec, or the
AR speech decoder now fails a test instead of only degrading a benchmark.

Chance levels: ASR/out-CER ~100% (random decodes share almost no
characters with the reference), spoken-QA accuracy 1/16 = 6.25%.
"""

import json
import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "freeze_omni_tpu", "assets", "tiny_s2s")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(os.path.join(CKPT, "params")),
                       reason="trained tiny_s2s checkpoint not present"),
]


def _run(main_fn, argv):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main_fn(argv)
    line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    return json.loads(line[-1])


@pytest.fixture(scope="module")
def manifests(tmp_path_factory):
    """Freshly drawn held-out audio (seeds disjoint from training AND from
    the script's own dev manifests)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from train_tiny_s2s import PARTNER, SR_ASR, WORDS, render

    from freeze_omni_tpu.frontend.wav import write_wav

    d = tmp_path_factory.mktemp("tiny_s2s_dev")
    r = np.random.RandomState(77_000_001)
    asr = d / "asr.tsv"
    with open(asr, "w") as f:
        for i in range(12):
            ws = [WORDS[r.randint(16)] for _ in range(r.randint(2, 5))]
            p = str(d / f"a{i:02d}.wav")
            write_wav(p, render(ws, SR_ASR), SR_ASR)
            f.write(f"{p}\t{' '.join(ws)}\n")
    qa = d / "qa.tsv"
    with open(qa, "w") as f:
        for i, w in enumerate(WORDS):
            p = str(d / f"q{i:02d}.wav")
            write_wav(p, render([w], SR_ASR), SR_ASR)
            f.write(f"{p}\t{PARTNER[w]}\n")
    sents = d / "sents.txt"
    with open(sents, "w") as f:
        for i in range(8):
            ws = [WORDS[r.randint(16)] for _ in range(r.randint(2, 4))]
            f.write(" ".join(ws) + "\n")
    return {"asr": str(asr), "qa": str(qa), "sents": str(sents)}


class TestTinyS2SQuality:
    def test_shipped_quality_artifact_beats_chance(self):
        """The training run's own held-out numbers, recorded at save time."""
        with open(os.path.join(CKPT, "QUALITY.json")) as f:
            q = json.load(f)
        assert q["asr_cer_pct"] < 50.0, q
        assert q["qa_accuracy_pct"] > 25.0, q     # chance 6.25
        assert q["out_cer_pct"] < 60.0, q

    def test_asr_cer_on_fresh_heldout(self, manifests):
        from freeze_omni_tpu.bin import asr_eval

        out = _run(asr_eval.main, [
            "--model_path", CKPT, "--manifest", manifests["asr"],
            "--char_level", "--batch", "6", "--max_tokens", "24"])
        assert out["value"] < 50.0, out

    def test_spoken_qa_on_fresh_heldout(self, manifests):
        from freeze_omni_tpu.bin import qa_eval

        out = _run(qa_eval.main, [
            "--model_path", CKPT, "--manifest", manifests["qa"],
            "--batch", "8", "--max_tokens", "12"])
        assert out["value"] > 25.0, out           # chance 6.25

    def test_out_cer_round_trip_on_fresh_sentences(self, manifests):
        from freeze_omni_tpu.bin import out_cer_eval

        out = _run(out_cer_eval.main, [
            "--model_path", CKPT, "--manifest", manifests["sents"],
            "--top_k", "1", "--max_tokens", "24"])
        assert out["value"] < 60.0, out
