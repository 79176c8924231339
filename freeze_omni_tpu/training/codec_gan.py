"""TiCodec GAN training: discriminators + losses.

Training-only components of the codec (models/decoder/ticodec/models.py:
257-426): HiFiGAN-style multi-period and multi-scale discriminators, LSGAN
adversarial losses, feature-matching loss, and a log-mel reconstruction loss —
as pure JAX functions plus a two-optimizer train step (generator+quantizer vs
discriminators). The VQ commitment/codebook losses mirror
Quantizer.for_one_step (models.py:610-613).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CodecConfig, FbankConfig
from ..models.codec import _lrelu
from ..models.layers import conv1d, conv1d_init

PERIODS = (2, 3, 5, 7, 11)


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


def _conv2d_k1_init(key, cin, cout, k, dtype=jnp.float32):
    """(k, 1) kernel as used by the period discriminators."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    return {"w": jax.random.uniform(kw, (cout, cin, k, 1), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), dtype, -bound, bound)}


def init_period_discriminator(key, dtype=jnp.float32) -> dict:
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    ks = jax.random.split(key, len(chans) + 1)
    return {
        "convs": [_conv2d_k1_init(ks[i], cin, cout, 5, dtype)
                  for i, (cin, cout) in enumerate(chans)],
        "post": _conv2d_k1_init(ks[-1], 1024, 1, 3, dtype),
    }


def period_discriminator(p, x, period: int):
    """x: [B, 1, T] -> (score [B, n], fmaps). Conv2d over [T/p, p] with
    (5,1)/(3,1) kernels/strides (models.py:257-307)."""
    B, C, T = x.shape
    pad = (period - T % period) % period
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        T = T + pad
    x = x.reshape(B, C, T // period, period)
    fmaps = []
    strides = [3, 3, 3, 3, 1]
    for conv, s in zip(p["convs"], strides):
        # kernel (5,1) stride (s,1), padding (2,0)
        x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(s, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW")) + conv["b"][None, :, None, None]
        x = _lrelu(x)
        fmaps.append(x)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, p["post"]["w"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + p["post"]["b"][None, :, None, None]
    fmaps.append(x)
    return x.reshape(B, -1), fmaps


# (cin, cout, kernel, stride, groups) per scale-discriminator conv
MSD_SPECS = (
    (1, 128, 15, 1, 1), (128, 128, 41, 2, 4), (128, 256, 41, 2, 16),
    (256, 512, 41, 4, 16), (512, 1024, 41, 4, 16), (1024, 1024, 41, 1, 16),
    (1024, 1024, 5, 1, 1),
)


def init_scale_discriminator(key, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, len(MSD_SPECS) + 1)
    return {
        "convs": [conv1d_init(ks[i], cin, cout, k, groups=g, dtype=dtype)
                  for i, (cin, cout, k, s, g) in enumerate(MSD_SPECS)],
        "post": conv1d_init(ks[-1], 1024, 1, 3, dtype=dtype),
    }


def scale_discriminator(p, x):
    """x: [B, 1, T] -> (score, fmaps) (models.py:309-340 shape)."""
    fmaps = []
    for conv, (_, _, k, s, g) in zip(p["convs"], MSD_SPECS):
        x = conv1d(conv, x, stride=s, padding=(k // 2, k // 2), groups=g)
        x = _lrelu(x)
        fmaps.append(x)
    x = conv1d(p["post"], x, padding=(1, 1))
    fmaps.append(x)
    return x.reshape(x.shape[0], -1), fmaps


def init_discriminators(key, dtype=jnp.float32) -> dict:
    kp = jax.random.split(key, len(PERIODS) + 3)
    return {
        "mpd": [init_period_discriminator(kp[i], dtype)
                for i in range(len(PERIODS))],
        "msd": [init_scale_discriminator(kp[len(PERIODS) + i], dtype)
                for i in range(3)],
    }


def run_discriminators(params, wav):
    """wav: [B, 1, T] -> list of (score, fmaps) over all sub-discriminators."""
    outs = []
    for p, period in zip(params["mpd"], PERIODS):
        outs.append(period_discriminator(p, wav, period))
    x = wav
    for i, p in enumerate(params["msd"]):
        if i > 0:
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 4), (1, 1, 2),
                                      "SAME") / 4.0
        outs.append(scale_discriminator(p, x))
    return outs


# ---------------------------------------------------------------------------
# losses (models.py:343-426)
# ---------------------------------------------------------------------------


def discriminator_loss(real_outs, fake_outs):
    loss = 0.0
    for (dr, _), (dg, _) in zip(real_outs, fake_outs):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adv_loss(fake_outs):
    return sum(jnp.mean((1.0 - dg) ** 2) for dg, _ in fake_outs)


def feature_matching_loss(real_outs, fake_outs):
    loss = 0.0
    for (_, fr), (_, ff) in zip(real_outs, fake_outs):
        for r, f in zip(fr, ff):
            loss += jnp.mean(jnp.abs(r - f))
    return 2.0 * loss


def mel_l1_loss(real: jnp.ndarray, fake: jnp.ndarray,
                sample_rate: int = 24000) -> jnp.ndarray:
    """Log-mel L1 between waveforms [B, 1, T] (HiFiGAN mel loss role)."""
    cfg = FbankConfig(sample_rate=sample_rate, num_mel_bins=80,
                      frame_length_ms=1024 / sample_rate * 1000,
                      frame_shift_ms=256 / sample_rate * 1000,
                      preemphasis=0.0, remove_dc_offset=False)
    from ..frontend.fbank import fbank

    m_r = fbank(real[:, 0] * 32768.0, cfg)
    m_f = fbank(fake[:, 0] * 32768.0, cfg)
    return jnp.mean(jnp.abs(m_r - m_f))


def vq_losses(quantized, pre_quant, codebook_lambda: float = 1.0,
              commitment_lambda: float = 0.25):
    """Straight-through VQ losses (models.py:610-613)."""
    codebook = jnp.mean((quantized - jax.lax.stop_gradient(pre_quant)) ** 2)
    commit = jnp.mean((jax.lax.stop_gradient(quantized) - pre_quant) ** 2)
    return codebook_lambda * codebook + commitment_lambda * commit


class GanTrainState(NamedTuple):
    gen_params: dict
    disc_params: dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray


def make_gan_optimizers(lr: float = 2e-4, disc_lr: float | None = None,
                        clip: float = 10.0):
    """(generator, discriminator) optimizers. The two rates are separate
    because the stable regions differ: at tiny dims the generator needs a
    high rate to escape the predict-the-mean plateau, while the LSGAN
    discriminator diverges there (observed at 2e-3: d-loss exploding to
    ~2.6e6 within 200 adversarial steps, dragging mel from 170 back to 344).
    Global-norm clipping bounds the one-step damage either loss can do."""
    d_lr = lr if disc_lr is None else disc_lr
    return (optax.chain(optax.clip_by_global_norm(clip),
                        optax.adam(lr, b1=0.8, b2=0.99)),
            optax.chain(optax.clip_by_global_norm(clip),
                        optax.adam(d_lr, b1=0.8, b2=0.99)))


def reseed_dead_codes(gen_params: dict, cfg: CodecConfig,
                      features: jnp.ndarray, rng: np.random.RandomState,
                      noise: float = 1e-3) -> Tuple[dict, int]:
    """Restart codebook entries no feature in `features` maps to.

    K-means-style dead-code reinit (the standard VQ-GAN/SoundStream guard):
    with a randomly initialized codebook most features fall to a handful of
    entries; the codebook loss then drags those few toward the GLOBAL feature
    mean while the rest never receive gradient, so the quantizer degenerates
    to ~1 effective code and the decoder reconstructs the dataset-average
    waveform. Reassigning unused entries to actual encoder outputs (plus a
    little noise to split ties) keeps the codebook covering the feature
    distribution while it moves. Host-side numpy: runs every N warm-phase
    steps on a probe batch; tiny next to a training step.

    features: [B, C, T] pre-quant encoder output. Returns (params, n_dead).
    """
    feats = np.asarray(jnp.swapaxes(features, 1, 2)).reshape(
        -1, features.shape[1])  # [B*T, C]
    G = cfg.n_code_groups
    gd = features.shape[1] // G
    cbs = gen_params["quantizer"]["codebooks"]
    new_cbs = []
    total_dead = 0
    residual = feats.copy()
    # each codebooks[r] is ONE stacked [G, n_codes, gd] array (codec.py:85-90)
    # — mutate groups in place within the stack so the pytree structure (and
    # with it the optimizer state) is preserved leaf-for-leaf
    for r in range(cfg.residual_layers):
        cb_r = np.array(cbs[r])
        for g in range(G):
            cb = cb_r[g]
            x = residual[:, g * gd:(g + 1) * gd]
            d = (x ** 2).sum(1)[:, None] + (cb ** 2).sum(1)[None] \
                - 2.0 * x @ cb.T
            idx = d.argmin(1)
            used = np.zeros(cb.shape[0], bool)
            used[np.unique(idx)] = True
            dead = ~used
            n_dead = int(dead.sum())
            if n_dead:
                picks = x[rng.randint(0, x.shape[0], n_dead)]
                cb_r[g, dead] = picks + noise * rng.randn(
                    n_dead, gd).astype(cb.dtype)
                total_dead += n_dead
            residual[:, g * gd:(g + 1) * gd] = x - cb_r[g][idx]
        new_cbs.append(jnp.asarray(cb_r, dtype=cbs[r].dtype))
    qp = dict(gen_params["quantizer"])
    qp["codebooks"] = new_cbs
    out = dict(gen_params)
    out["quantizer"] = qp
    return out, total_dead


def gan_step(state: GanTrainState, cfg: CodecConfig, wav: jnp.ndarray,
             gen_fn, gen_optimizer, disc_optimizer, adv_weight: float = 1.0
             ) -> Tuple[GanTrainState, dict]:
    """One generator + one discriminator update. gen_fn(gen_params, wav)
    returns the reconstructed waveform [B, 1, T] (encode->quantize->decode),
    or a (waveform, aux_loss) pair — aux_loss is added to the generator
    objective. That hook is how the VQ codebook/commitment terms reach the
    update: the straight-through estimator routes reconstruction gradients
    around the codebook, so WITHOUT an explicit codebook loss the codebooks
    sit at random init forever and reconstruction plateaus (observed: mel L1
    stuck ~8.3 over 2500 steps while every decode came out near-silent).
    adv_weight scales adv+fm; 0.0 gives a pure-reconstruction warm phase
    (standard VQ-GAN practice) so the generator learns signal before the
    discriminators start pushing it around."""

    def run_gen(gp):
        out = gen_fn(gp, wav)
        return out if isinstance(out, tuple) else (out, jnp.zeros(()))

    def d_loss_fn(dp):
        fake, _ = run_gen(state.gen_params)
        fake = jax.lax.stop_gradient(fake)
        t = min(fake.shape[-1], wav.shape[-1])
        real_outs = run_discriminators(dp, wav[..., :t])
        fake_outs = run_discriminators(dp, fake[..., :t])
        return discriminator_loss(real_outs, fake_outs)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
    d_updates, disc_opt = disc_optimizer.update(d_grads, state.disc_opt,
                                                state.disc_params)
    disc_params = optax.apply_updates(state.disc_params, d_updates)

    def g_loss_fn(gp):
        fake, aux = run_gen(gp)
        t = min(fake.shape[-1], wav.shape[-1])
        real_outs = run_discriminators(disc_params, wav[..., :t])
        fake_outs = run_discriminators(disc_params, fake[..., :t])
        adv = generator_adv_loss(fake_outs)
        fm = feature_matching_loss(real_outs, fake_outs)
        mel = 45.0 * mel_l1_loss(wav[..., :t], fake[..., :t], cfg.sample_rate)
        return adv_weight * (adv + fm) + mel + aux, \
            {"adv": adv, "fm": fm, "mel": mel, "aux": aux}

    (g_loss, parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.gen_params)
    g_updates, gen_opt = gen_optimizer.update(g_grads, state.gen_opt,
                                              state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, g_updates)

    return (GanTrainState(gen_params, disc_params, gen_opt, disc_opt,
                          state.step + 1),
            {"d_loss": d_loss, "g_loss": g_loss, **parts})
