import pytest
import json

import numpy as np

from freeze_omni_tpu.utils.metrics import cer, corpus_score, edit_distance, wer


class TestMetrics:
    def test_edit_distance(self):
        assert edit_distance("abc", "abc") == 0
        assert edit_distance("abc", "axc") == 1
        assert edit_distance("abc", "") == 3
        assert edit_distance("", "ab") == 2
        assert edit_distance("kitten", "sitting") == 3

    def test_wer_cer(self):
        assert wer("the cat sat", "the cat sat") == 0.0
        assert abs(wer("the cat sat", "the bat sat") - 1 / 3) < 1e-9
        assert cer("abcd", "abxd") == 0.25
        # punctuation/case-insensitive
        assert wer("Hello, World!", "hello world") == 0.0

    def test_corpus_score_weighted(self):
        pairs = [("aaaa", "aaaa"), ("bb", "cc")]
        assert abs(corpus_score(pairs, char_level=True) - 2 / 6) < 1e-9


class TestAsrEvalHarness:
    def test_harness_end_to_end(self, tmp_path, capsys):
        from freeze_omni_tpu.bin.asr_eval import main
        from freeze_omni_tpu.frontend.wav import write_wav

        sr = 16000
        t = np.arange(sr // 2) / sr
        p1 = tmp_path / "a.wav"
        write_wav(str(p1), (0.3 * np.sin(2 * np.pi * 250 * t)).astype(np.float32), sr)
        manifest = tmp_path / "dev.tsv"
        manifest.write_text(f"{p1}\thello world\n")

        main(["--preset", "tiny", "--manifest", str(manifest),
              "--max_tokens", "6"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        res = json.loads(out)
        assert res["metric"] == "wer" and res["n_utts"] == 1
        assert 0.0 <= res["value"] <= 400.0  # random weights: garbage hyp

    def test_batched_eval_matches_rows_and_runs_cli(self, tmp_path, capsys):
        """--batch N: utterances share every device step. Identical wavs in
        one batch must transcribe identically (greedy decoding), and the CLI
        path scores a multi-utterance manifest."""
        from freeze_omni_tpu.bin.asr_eval import batched_transcribe, main
        from freeze_omni_tpu.config import tiny_system
        from freeze_omni_tpu.frontend.wav import write_wav
        from freeze_omni_tpu.pipeline import InferencePipeline

        sr = 16000
        t = np.arange(sr // 2) / sr
        wav = (0.3 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)

        cfg = tiny_system()
        pipeline = InferencePipeline(cfg, seed=0)
        hyps = batched_transcribe(pipeline, cfg, [wav, wav.copy()],
                                  max_tokens=6)
        assert len(hyps) == 2
        assert hyps[0] == hyps[1]  # same audio, greedy -> same row output

        paths = []
        for i, scale in enumerate((0.3, 0.2, 0.25)):
            p = tmp_path / f"u{i}.wav"
            write_wav(str(p), (scale * np.sin(2 * np.pi * (200 + 30 * i) * t)
                               ).astype(np.float32), sr)
            paths.append(p)
        manifest = tmp_path / "dev.tsv"
        manifest.write_text("".join(f"{p}\tref text {i}\n"
                                    for i, p in enumerate(paths)))
        main(["--preset", "tiny", "--manifest", str(manifest),
              "--max_tokens", "6", "--batch", "2"])
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["n_utts"] == 3
        assert res["metric"] == "wer" and res["value"] >= 0.0


class TestOutCerEvalHarness:
    def test_harness_end_to_end(self, tmp_path, capsys):
        """Synthesize each manifest sentence (teacher-forced LLM hiddens ->
        AR decoder -> vocoder), ASR it back, score CER — the harness for the
        reference's out_cer.png table (top-k sweep). Random weights give
        garbage transcripts; the structure must still round-trip."""
        from freeze_omni_tpu.bin.out_cer_eval import main

        manifest = tmp_path / "sents.txt"
        manifest.write_text("hello world\n")
        by_top_k = main(["--preset", "tiny", "--manifest", str(manifest),
                         "--top_k", "1,2", "--max_tokens", "4"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        res = json.loads(out)
        assert res["metric"] == "out_cer" and res["n_utts"] == 1
        assert set(by_top_k) == {1, 2}
        for v in by_top_k.values():
            assert np.isfinite(v) and 0.0 <= v <= 400.0


class TestQAScoring:
    def test_normalize(self):
        from freeze_omni_tpu.utils.metrics import qa_normalize
        assert qa_normalize("The  Answer, is: Paris!") == "answer is paris"
        assert qa_normalize("A  an the") == ""

    def test_exact_match_and_contains(self):
        from freeze_omni_tpu.utils.metrics import qa_contains, qa_exact_match
        assert qa_exact_match(["Paris", "paris france"], "  PARIS. ") == 1.0
        assert qa_exact_match(["Paris"], "in Paris") == 0.0
        assert qa_contains(["Paris"], "It is in Paris, of course.") == 1.0
        assert qa_contains(["New York"], "I think York.") == 0.0
        assert qa_contains(["the answer"], "answer!") == 1.0  # articles drop

    def test_f1(self):
        from freeze_omni_tpu.utils.metrics import qa_f1
        assert qa_f1(["Barack Obama"], "Obama") == pytest.approx(2/3)
        assert qa_f1(["a b", "x y z"], "x y z") == 1.0
        assert qa_f1(["foo"], "bar") == 0.0


class TestQAEmptyGoldGuards:
    def test_empty_normalized_gold_never_credits(self):
        from freeze_omni_tpu.utils.metrics import (qa_contains,
                                                   qa_exact_match, qa_f1)
        for fn in (qa_exact_match, qa_contains, qa_f1):
            assert fn(["the"], "") == 0.0, fn
            assert fn(["***"], "   ") == 0.0, fn
        assert qa_contains(["the", "Paris"], "paris") == 1.0
