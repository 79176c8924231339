"""Training CLI: the Freeze-Omni curriculum with checkpoint/resume.

The reference has no trainer, no saving, no resume (SURVEY.md §5: inference-
only strict=False loads). This driver runs the paper recipe's stages against
the frozen LLM with optax, orbax checkpointing, periodic save, and resume —
data-parallel over a ('data','model') mesh when more than one device exists.

Stages (--stage):
  ctc      input-side 1: encoder ASR pretraining (CTC head, no LLM)
  align    input-side 2: encoder+adapter text CE through the frozen LLM
  prompt   input-side 3: prompt-embedding tuning only (tables frozen-LLM CE)
  state    duplex: encoder/adapter/state-head chunk-label CE
  decoder  output-side 2/3: AR speech-decoder teacher-forced CE
  lora     low-rank adapter on the frozen LLM (next-token CE; the working
           form of the reference's dead LoRA block, audioLLM.py:150-157) —
           writes <ckpt_dir>/lora.npz for `serve --lora`
  all      combined duplex step (state [+ decoder]) — default
(Output-side stage 1, codec GAN training, is training/codec_gan.py.)

Data: synthetic separable fixtures by default (training/data.py); pass
--manifest wav<TAB>transcript TSV (the bin/asr_eval.py format) to train the
ASR stages (ctc/align/prompt) on real audio via training/manifest.py
(length-bucketed static shapes + background prefetch).

Usage:
  python -m freeze_omni_tpu.bin.train --preset tiny --stage align --steps 20 \
      --ckpt_dir /tmp/ckpt [--resume] [--batch 4] [--lr 1e-4] \
      [--manifest train.tsv --epochs 2 --tokenizer /path/to/hf_tokenizer]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="freeze-omni-tpu trainer")
    p.add_argument("--preset", default="tiny", choices=["tiny", "flagship"])
    p.add_argument("--stage", default="all",
                   choices=["ctc", "align", "prompt", "state", "decoder",
                            "lora", "all"])
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--lora_targets", default="q,v",
                   help="comma-joined projection names for --stage lora "
                        "(among q,k,v,o,gate,up,down)")
    p.add_argument("--ctc_vocab", type=int, default=None,
                   help="CTC label-space size (default: 16 for synthetic "
                        "data; max manifest token id + 1 with --manifest)")
    p.add_argument("--manifest", default=None,
                   help="wav<TAB>transcript TSV for the ASR stages")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir (default: ByteTokenizer)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--with_decoder", action="store_true", default=True)
    # multi-host (DCN): run one trainer process per host; gradients psum
    # across hosts once per step (parallel/multihost.py)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 — enables multi-host "
                        "(env: FO_COORDINATOR/FO_NUM_HOSTS/FO_HOST_ID)")
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--host_id", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = get_args(argv)
    from ..parallel import multihost as mh

    multi = mh.maybe_initialize_from_args(args.coordinator, args.num_hosts,
                                          args.host_id)
    from ..config import flagship_system, tiny_system
    from ..models import audio_llm
    from ..models import speech_decoder as sd
    from ..training import data as data_mod
    from ..training import train_step as ts
    from ..utils import checkpoint as ckpt_mod

    sys_cfg = tiny_system() if args.preset == "tiny" else flagship_system()
    cfg, dcfg = sys_cfg.audio_llm, sys_cfg.tts.decoder

    tokenizer = None
    if args.manifest:
        from ..training import manifest as mani_mod
        from ..utils.tokenizer import ByteTokenizer, HFTokenizer

        if args.stage not in mani_mod.ASR_STAGES:
            raise SystemExit(f"--manifest covers stages "
                             f"{mani_mod.ASR_STAGES}, not {args.stage!r}")
        tokenizer = (HFTokenizer(args.tokenizer) if args.tokenizer
                     else ByteTokenizer(cfg.llm.vocab_size))
        if args.ctc_vocab is None and args.stage == "ctc":
            args.ctc_vocab = 1 + max(
                max(tokenizer.encode(t), default=0)
                for _, t in mani_mod.read_manifest(args.manifest))
    if args.ctc_vocab is None:
        args.ctc_vocab = 16

    if args.stage == "prompt":
        import dataclasses
        cfg = dataclasses.replace(cfg, prompt_finetune=True)
    params = audio_llm.init_params(jax.random.PRNGKey(args.seed), cfg)
    if args.stage == "ctc":
        trainable = {
            "encoder_user": params["encoder_user"],
            "ctc_head": ts.init_ctc_head(jax.random.PRNGKey(args.seed + 2),
                                         cfg, vocab=args.ctc_vocab),
        }
        frozen = {}
    elif args.stage == "align":
        trainable = {
            "encoder_user": params["encoder_user"],
            "adapter_user": params["adapter_user"],
        }
        frozen = {"llm": params["llm"]}
    elif args.stage == "prompt":
        trainable = {"prompt_embeddings": params["prompt_embeddings"]}
        frozen = {"llm": params["llm"],
                  "encoder_user": params["encoder_user"],
                  "adapter_user": params["adapter_user"]}
    elif args.stage == "state":
        trainable = {
            "encoder_user": params["encoder_user"],
            "adapter_user": params["adapter_user"],
            "predictor": params["predictor"],
        }
        frozen = {"llm": params["llm"]}
    elif args.stage == "decoder":
        trainable = {"speech_decoder": sd.init_params(
            jax.random.PRNGKey(args.seed + 1), dcfg)}
        frozen = {}
    elif args.stage == "lora":
        from ..models import lora as lora_mod

        trainable = {"lora": lora_mod.init(
            jax.random.PRNGKey(args.seed + 3), cfg.llm, rank=args.lora_rank,
            targets=tuple(args.lora_targets.split(",")))}
        frozen = {"llm": params["llm"]}
    else:  # all
        trainable = {
            "encoder_user": params["encoder_user"],
            "adapter_user": params["adapter_user"],
            "predictor": params["predictor"],
            "speech_decoder": sd.init_params(
                jax.random.PRNGKey(args.seed + 1), dcfg),
        }
        frozen = {"llm": params["llm"]}

    # Data parallelism: with >1 device and a divisible batch, lay the batch
    # over a 1-D 'data' mesh and replicate params/optimizer state. (TP for
    # the frozen LLM is the serving path; training trees here are small.)
    # Multi-host: the 'data' axis spans every device of every host (hosts
    # outermost); each process feeds only its own batch rows and the gradient
    # psum crosses DCN once per step.
    n_dev = len(jax.devices())
    put_batch = None  # host batch dict -> device arrays on the 'data' mesh
    put_repl = None  # host pytree -> replicated device arrays
    if multi:
        if args.batch % n_dev != 0:
            raise SystemExit(f"multi-host requires --batch divisible by the "
                             f"global device count {n_dev}, got {args.batch}")
        from jax.sharding import PartitionSpec

        num_hosts, host_id = jax.process_count(), jax.process_index()
        mesh = mh.make_global_mesh(("data",))
        put_repl = lambda tree: mh.replicate_global(mesh, tree)
        put_batch = lambda b: {
            k: mh.host_local_to_global(mesh, PartitionSpec("data"), v)
            for k, v in mh.local_batch_slice(b, num_hosts, host_id).items()}
        trainable = put_repl(trainable)
        frozen = put_repl(frozen)
        print(f"multi-host data-parallel: {num_hosts} hosts x "
              f"{n_dev // num_hosts} devices", flush=True)
    elif n_dev > 1 and args.batch % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel import mesh as pmesh

        mesh = pmesh.make_mesh((n_dev,), ("data",))
        repl = NamedSharding(mesh, PartitionSpec())
        dp_sharding = NamedSharding(mesh, PartitionSpec("data"))
        put_repl = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, repl), tree)
        put_batch = lambda b: {k: jax.device_put(np.asarray(v), dp_sharding)
                               for k, v in b.items()}
        trainable = put_repl(trainable)
        frozen = put_repl(frozen)
        print(f"data-parallel over {n_dev} devices", flush=True)
    elif n_dev > 1:
        print(f"{n_dev} devices but batch {args.batch} not divisible; "
              f"running single-device", flush=True)

    optimizer = ts.make_optimizer(lr=args.lr)
    state = ts.init_train_state(trainable, optimizer)
    start_step = 0

    if args.resume and args.ckpt_dir and \
            os.path.exists(os.path.join(args.ckpt_dir, "latest")):
        like = jax.tree.map(np.zeros_like, state.trainable)
        restored = ckpt_mod.load_native(
            os.path.join(args.ckpt_dir, "latest"), like)
        meta = json.loads(
            open(os.path.join(args.ckpt_dir, "meta.json")).read())
        start_step = meta["step"]
        restored = jax.tree.map(jnp.asarray, restored)
        if put_repl is not None:
            restored = put_repl(restored)
        state = ts.init_train_state(restored, optimizer)
        opt_dir = os.path.join(args.ckpt_dir, "opt")
        if os.path.exists(opt_dir):
            opt_like = jax.tree.map(np.zeros_like, state.opt_state)
            opt_restored = jax.tree.map(
                jnp.asarray, ckpt_mod.load_native(opt_dir, opt_like))
            if put_repl is not None:
                opt_restored = put_repl(opt_restored)
            state = state._replace(opt_state=opt_restored)
        else:
            print("no optimizer state in checkpoint; adamw moments reset",
                  flush=True)
        state = state._replace(step=jnp.asarray(start_step, jnp.int32))
        print(f"resumed from step {start_step}", flush=True)

    step_fn = jax.jit(
        lambda s, b: ts.stage_step(args.stage, s, frozen, optimizer, cfg,
                                   dcfg, b))

    if args.manifest:
        batch_iter = mani_mod.prefetch(mani_mod.manifest_batches(
            args.stage, args.manifest, tokenizer, cfg, args.batch,
            epochs=args.epochs, seed=args.seed + start_step))
    elif args.stage == "all":
        batch_iter = data_mod.batches(cfg, dcfg, args.batch, args.steps,
                                      seed=args.seed + start_step,
                                      with_decoder=args.with_decoder)
    else:
        batch_iter = data_mod.stage_batches(args.stage, cfg, dcfg, args.batch,
                                            args.steps,
                                            seed=args.seed + start_step)
    losses = []
    t0 = time.time()
    for i, batch in enumerate(batch_iter):
        if i >= args.steps:
            break
        if put_batch is not None:
            batch = put_batch(batch)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        loss = float(np.asarray(metrics["loss"]))
        losses.append(loss)
        step = start_step + i + 1
        if (step % 5 == 0 or i == 0) and (not multi or mh.is_primary()):
            print(f"step {step}: loss={loss:.4f} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)
        if multi and not mh.is_primary():
            continue  # only the primary host writes checkpoints
        if args.ckpt_dir and step % args.save_every == 0:
            ckpt_mod.save_native(os.path.join(args.ckpt_dir, "latest"),
                                 jax.device_get(state.trainable))
            # optimizer moments in a sibling tree so `latest` stays a pure
            # params checkpoint (loadable as weights without optax)
            ckpt_mod.save_native(os.path.join(args.ckpt_dir, "opt"),
                                 jax.device_get(state.opt_state))
            with open(os.path.join(args.ckpt_dir, "meta.json"), "w") as f:
                json.dump({"step": step, "loss": loss}, f)
            print(f"saved checkpoint at step {step}", flush=True)

    if args.stage == "lora" and args.ckpt_dir and \
            (not multi or mh.is_primary()):
        from ..models import lora as lora_mod

        os.makedirs(args.ckpt_dir, exist_ok=True)
        lora_path = os.path.join(args.ckpt_dir, "lora.npz")
        lora_mod.save(lora_path, jax.device_get(state.trainable["lora"]))
        print(f"saved LoRA adapter to {lora_path}", flush=True)

    summary = {"final_step": start_step + len(losses),
               "first_loss": round(losses[0], 4),
               "final_loss": round(losses[-1], 4)}
    if multi:
        # every host prints; checksum is a cross-host divergence probe
        # (replicated params => identical value on every host)
        summary["host_id"] = jax.process_index()
        summary["param_checksum"] = round(
            mh.tree_checksum(jax.device_get(state.trainable)), 6)
        print(json.dumps(summary), flush=True)
        mh.sync("train-done")
        mh.shutdown()
    else:
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
