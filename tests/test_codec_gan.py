import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import CodecConfig
from freeze_omni_tpu.models import codec as codec_mod
from freeze_omni_tpu.training import codec_gan as gan


def _cfg():
    return CodecConfig(
        upsample_rates=(8, 5, 5, 3), upsample_kernel_sizes=(16, 10, 10, 6),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), n_codes=16, global_code_num=2,
        global_feature_dim=8, global_feature_conv=(128, 8, 8, 3, 1),
        global_tokens=(0, 0),
    )


@pytest.mark.slow
class TestDiscriminators:
    def test_run_discriminators_shapes(self):
        params = gan.init_discriminators(jax.random.PRNGKey(0))
        wav = jnp.asarray(np.random.RandomState(0).randn(1, 1, 1200), jnp.float32)
        outs = gan.run_discriminators(params, wav)
        assert len(outs) == len(gan.PERIODS) + 3
        for score, fmaps in outs:
            assert score.ndim == 2 and score.shape[0] == 1
            assert len(fmaps) >= 5

    def test_losses_behave(self):
        params = gan.init_discriminators(jax.random.PRNGKey(1))
        rng = np.random.RandomState(1)
        real = jnp.asarray(rng.randn(1, 1, 1200) * 0.1, jnp.float32)
        fake = jnp.asarray(rng.randn(1, 1, 1200) * 0.1, jnp.float32)
        ro = gan.run_discriminators(params, real)
        fo = gan.run_discriminators(params, fake)
        d = gan.discriminator_loss(ro, fo)
        g = gan.generator_adv_loss(fo)
        fm = gan.feature_matching_loss(ro, fo)
        assert np.isfinite([float(d), float(g), float(fm)]).all()
        # fm of identical inputs is zero
        assert float(gan.feature_matching_loss(ro, ro)) == 0.0

    def test_mel_l1_zero_for_identical(self):
        wav = jnp.asarray(np.random.RandomState(2).randn(1, 1, 4800) * 0.1,
                          jnp.float32)
        assert float(gan.mel_l1_loss(wav, wav)) == 0.0
        shifted = wav * 0.5
        assert float(gan.mel_l1_loss(wav, shifted)) > 0.0

    def test_vq_losses(self):
        q = jnp.ones((2, 4, 8))
        pre = jnp.zeros((2, 4, 8))
        loss = gan.vq_losses(q, pre)
        assert abs(float(loss) - 1.25) < 1e-6  # 1.0*1 + 0.25*1


@pytest.mark.slow
class TestGanStep:
    def test_one_step_updates_generator(self):
        cfg = _cfg()
        gen_params = codec_mod.init_params(jax.random.PRNGKey(0), cfg)
        disc_params = gan.init_discriminators(jax.random.PRNGKey(1))
        g_opt, d_opt = gan.make_gan_optimizers()
        state = gan.GanTrainState(
            gen_params=gen_params, disc_params=disc_params,
            gen_opt=g_opt.init(gen_params), disc_opt=d_opt.init(disc_params),
            step=jnp.zeros((), jnp.int32))

        codes = jnp.zeros((1, 2, 1), jnp.int32)
        gst = jnp.zeros((1, 1, 2), jnp.int32)

        def gen_fn(gp, wav):
            return codec_mod.decode(gp, cfg, codes, gst)

        wav = jnp.asarray(np.random.RandomState(3).randn(1, 1, 1200) * 0.1,
                          jnp.float32)
        state2, metrics = gan.gan_step(state, cfg, wav, gen_fn, g_opt, d_opt)
        assert np.isfinite([float(metrics[k]) for k in
                            ("d_loss", "g_loss", "adv", "fm", "mel")]).all()
        before = np.asarray(gen_params["generator"]["conv_pre"]["w"])
        after = np.asarray(state2.gen_params["generator"]["conv_pre"]["w"])
        assert not np.allclose(before, after)
        assert int(state2.step) == 1
