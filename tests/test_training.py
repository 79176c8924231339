import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import (AdapterConfig, AudioLLMConfig,
                                    EncoderConfig, LLMConfig,
                                    SpeechDecoderConfig)
from freeze_omni_tpu.models import audio_llm
from freeze_omni_tpu.models import speech_decoder as sd
from freeze_omni_tpu.training import data as data_mod
from freeze_omni_tpu.training import train_step as ts


def _cfgs():
    cfg = AudioLLMConfig(
        encoder=EncoderConfig(input_dim=80, output_dim=32, attention_dim=32,
                              attention_heads=4, linear_units=64, num_blocks=2,
                              chunk_size=4, left_chunks=2, pe_max_len=256),
        adapter=AdapterConfig(enc_out_dim=32, llm_dim=128),
        llm=LLMConfig(hidden=128, num_layers=2, num_heads=4, num_kv_heads=2,
                      ffn=256, vocab_size=128, max_kv_len=64),
    )
    dcfg = SpeechDecoderConfig(idim=32, hidden=32, num_layers=2, num_heads=2,
                               ffn=64, codec_vocab=16, max_kv_len=64)
    return cfg, dcfg


class TestTraining:
    @pytest.mark.slow
    def test_loss_decreases_over_steps(self):
        """The full train step (state-head CE through the frozen LLM +
        speech-decoder CE, adamw) must fit a fixed synthetic batch."""
        cfg, dcfg = _cfgs()
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        trainable = {
            "encoder_user": params["encoder_user"],
            "adapter_user": params["adapter_user"],
            "predictor": params["predictor"],
            "speech_decoder": sd.init_params(jax.random.PRNGKey(1), dcfg),
        }
        frozen = {"llm": params["llm"]}
        opt = ts.make_optimizer(lr=3e-3)
        state = ts.init_train_state(trainable, opt)

        batch = data_mod.synth_audio_llm_batch(0, cfg, batch=2)
        batch.update(data_mod.synth_decoder_batch(1, dcfg, batch=2))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        step = jax.jit(lambda s, b: ts.train_step(s, frozen, opt, cfg, dcfg, b))
        losses = []
        for _ in range(12):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses
        # frozen LLM untouched
        np.testing.assert_array_equal(
            np.asarray(frozen["llm"]["layers"]["q"]["w"]),
            np.asarray(params["llm"]["layers"]["q"]["w"]))

    @pytest.mark.slow
    def test_dp_train_cli_and_resume(self, tmp_path):
        """The train CLI lays the batch data-parallel over all devices
        (conftest forces 8 virtual CPU devices) and the resume path re-places
        restored params on the replicated sharding before re-jitting."""
        from freeze_omni_tpu.bin.train import main

        ckpt = str(tmp_path / "ckpt")
        main(["--preset", "tiny", "--stage", "all", "--steps", "4",
              "--batch", "8", "--ckpt_dir", ckpt, "--save_every", "2",
              "--lr", "3e-3"])
        main(["--preset", "tiny", "--stage", "all", "--steps", "2",
              "--batch", "8", "--ckpt_dir", ckpt, "--save_every", "2",
              "--resume"])
        import json
        import os
        meta = json.loads(open(os.path.join(ckpt, "meta.json")).read())
        assert meta["step"] == 6
        # true resume: optimizer moments are checkpointed alongside params
        assert os.path.exists(os.path.join(ckpt, "opt"))

    def test_batch_shapes(self):
        cfg, dcfg = _cfgs()
        bs = list(data_mod.batches(cfg, dcfg, batch=3, steps=2))
        assert len(bs) == 2
        assert bs[0]["fbank"].shape == (3, 67, 80)
        assert bs[0]["labels"].shape[0] == 3
        assert set(np.unique(bs[0]["labels"][:, -1])) <= {1, 2}
        assert bs[0]["dec_y"].shape == (3, 8)

class TestCurriculumStages:
    """The paper's stage-wise recipe: CTC encoder pretraining (input stage 1),
    frozen-LLM ASR alignment (stage 2), prompt tuning (stage 3). Each stage
    must actually learn its synthetic separable task, and only the declared
    trainable subset may move."""

    def test_ctc_stage_learns(self):
        cfg, _ = _cfgs()
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        trainable = {
            "encoder_user": params["encoder_user"],
            "ctc_head": ts.init_ctc_head(jax.random.PRNGKey(2), cfg, vocab=16),
        }
        opt = ts.make_optimizer(lr=3e-3)
        state = ts.init_train_state(trainable, opt)
        batch = {k: jnp.asarray(v)
                 for k, v in data_mod.synth_ctc_batch(0, cfg, 2).items()}
        step = jax.jit(
            lambda s, b: ts.stage_step("ctc", s, {}, opt, cfg, None, b))
        losses = []
        for _ in range(12):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.6, losses

    @pytest.mark.slow
    def test_align_stage_learns_and_freezes_llm(self):
        cfg, _ = _cfgs()
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        trainable = {"encoder_user": params["encoder_user"],
                     "adapter_user": params["adapter_user"]}
        frozen = {"llm": params["llm"]}
        opt = ts.make_optimizer(lr=3e-3)
        state = ts.init_train_state(trainable, opt)
        batch = {k: jnp.asarray(v)
                 for k, v in data_mod.synth_asr_batch(0, cfg, 2).items()}
        step = jax.jit(
            lambda s, b: ts.stage_step("align", s, frozen, opt, cfg, None, b))
        losses = []
        for _ in range(15):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses
        np.testing.assert_array_equal(
            np.asarray(frozen["llm"]["layers"]["q"]["w"]),
            np.asarray(params["llm"]["layers"]["q"]["w"]))

    @pytest.mark.slow
    def test_prompt_stage_trains_only_prompt_table(self):
        import dataclasses
        cfg, _ = _cfgs()
        cfg = dataclasses.replace(cfg, prompt_finetune=True)
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        before = {k: jax.tree.map(np.array, params[k])
                  for k in ("encoder_user", "adapter_user")}
        trainable = {"prompt_embeddings": params["prompt_embeddings"]}
        frozen = {"llm": params["llm"],
                  "encoder_user": params["encoder_user"],
                  "adapter_user": params["adapter_user"]}
        opt = ts.make_optimizer(lr=3e-3)
        state = ts.init_train_state(trainable, opt)
        batch = {k: jnp.asarray(v)
                 for k, v in data_mod.synth_asr_batch(0, cfg, 2).items()}
        step = jax.jit(
            lambda s, b: ts.stage_step("prompt", s, frozen, opt, cfg, None, b))
        losses = []
        for _ in range(15):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses
        # prompt table moved; everything else untouched
        assert not np.allclose(np.asarray(state.trainable["prompt_embeddings"]),
                               np.asarray(params["prompt_embeddings"]))
        for k, tree in before.items():
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                tree, frozen[k])

    def test_stage_batches_shapes(self):
        cfg, dcfg = _cfgs()
        b = next(iter(data_mod.stage_batches("ctc", cfg, dcfg, 2, 1)))
        assert b["fbank"].shape[0] == 2 and b["tokens"].max() < 16
        b = next(iter(data_mod.stage_batches("align", cfg, dcfg, 2, 1)))
        assert b["text_ids"].shape == b["text_mask"].shape
        with pytest.raises(ValueError):
            next(iter(data_mod.stage_batches("nope", cfg, dcfg, 2, 1)))
