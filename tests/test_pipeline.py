import argparse

import numpy as np
import pytest

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.frontend.wav import write_wav
from freeze_omni_tpu.pipeline import DuplexPipeline, InferencePipeline, post_process


class TestPostProcess:
    def test_punctuation_rules(self):
        assert post_process("hello world") == "hello world。"
        assert post_process("trailing,") == "trailing。"
        assert post_process("a*b_c`d~e.") == "abcde."
        assert post_process("1. item") == "1:item。"
        assert post_process("你好、世界") == "你好，世界。"


class TestOfflinePipeline:
    def test_stage_machine(self):
        cfg = tiny_system()
        p = InferencePipeline(cfg, seed=0)
        out = p.speech_dialogue(None, stat="pre", role="You are a test.")
        assert out["stat"] == "dialog_sl"

        chunk = np.random.RandomState(0).randn(1, 19, 80).astype(np.float32)
        out = p.speech_dialogue(chunk, **out)
        assert out["stat"] == "dialog_cl"
        assert out["state_probs"].shape == (3,)
        assert abs(float(out["state_probs"].sum()) - 1.0) < 1e-4

        out = p.speech_dialogue(chunk, **out)
        # force speak
        out["adapter_cache"] = None
        out["encoder_cache"] = None
        out["stat"] = "dialog_ss"
        out = p.speech_dialogue(None, **out)
        assert out["stat"] in ("dialog_cs", "dialog_sl")
        assert len(out["past_tokens"]) == 1
        assert out["hidden_state"].shape == (1, 1, cfg.audio_llm.llm.hidden)

        for _ in range(4):
            if out["stat"] != "dialog_cs":
                break
            out = p.speech_dialogue(None, **out)
        assert len(out["past_tokens"]) >= 2

    def test_offline_e2e_wav_to_wav(self, tmp_path):
        from freeze_omni_tpu.bin.offline_infer import run_inference

        cfg = tiny_system()
        sr = 16000
        t = np.arange(sr // 2) / sr
        wav = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        in_path = str(tmp_path / "in.wav")
        out_path = str(tmp_path / "out.wav")
        write_wav(in_path, wav, sr)

        args = argparse.Namespace(input_wav=in_path, output_wav=out_path,
                                  max_tokens=6, seed=0, top_k=5, top_p=0.8,
                                  temperature=0.7)
        text, audio = run_inference(cfg, args)
        assert isinstance(text, str) and len(text) > 0
        assert audio.ndim == 1 and audio.shape[0] > 0
        from freeze_omni_tpu.frontend.wav import read_wav

        back, osr = read_wav(out_path)
        assert osr == cfg.tts.codec.sample_rate
        assert back.shape[0] == audio.shape[0]


class TestDuplexPipeline:
    def test_fork_tuple_api(self):
        cfg = tiny_system()
        p = DuplexPipeline(cfg, seed=0)
        pred, kv, adp, enc, pe = p.speech_dialogue(
            None, identity="", status="pre", role="Test prompt.")
        assert pred is None and adp is None and enc is None and pe is None
        base_len = int(np.asarray(kv.length)[0])
        assert base_len > 0

        chunk = np.random.RandomState(1).randn(1, 32, 80).astype(np.float32)
        pred, kv, adp, enc, pe = p.speech_dialogue(
            chunk, identity="user", status="ipu_sl", past_key_values=kv,
            adapter_cache=None, encoder_cache=None, pe_index=0)
        assert set(pred) == {"state_1", "state_2"}
        assert 0.0 <= pred["state_1"] <= 1.0
        # chat prefix + 4 llm embeddings appended
        grew = int(np.asarray(kv.length)[0]) - base_len
        assert grew == 4 + len(p.core.chat.user_prefix_ids)

        # continue chunk: no prefix
        pred, kv2, adp, enc, pe = p.speech_dialogue(
            chunk, identity="user", status="ipu_cl", past_key_values=kv,
            adapter_cache=adp, encoder_cache=enc, pe_index=pe)
        assert int(np.asarray(kv2.length)[0]) - int(np.asarray(kv.length)[0]) == 4
        assert pe == 8  # two chunks * encoder chunk_size 4

        # system audio: no prediction
        pred_s, kv3, *_ = p.speech_dialogue(
            chunk, identity="system", status="ipu_sl", past_key_values=kv2,
            adapter_cache=None, encoder_cache=None, pe_index=0)
        assert pred_s is None
        assert int(np.asarray(kv3.length)[0]) > int(np.asarray(kv2.length)[0])
