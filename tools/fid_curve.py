#!/usr/bin/env python
"""FID-vs-training-step curve over a GAN run's periodic checkpoints.

VERDICT r3 Weak #3: the FID harness had only ever scored one near-noise
checkpoint, so nothing showed it DISCRIMINATES. This walks every step_* dir
under --checkpoint, samples the SAME caption batch + PRNG key through each
restored generator, and scores it against the SAME real image set with the
calibrated featurizer (eval/fid.py). A healthy training run must produce a
decreasing curve; a flat or random curve means the harness (or the run) is
broken.

  python tools/fid_curve.py --checkpoint /run/ckpt/gan \
      --captions-path /run/caps.json --data-root /tmp/photo_corpus \
      --out docs/e2e_photos/fid_curve

Prints one JSON line per checkpoint and a final summary line; writes
fid_curve.json (+ fid_curve.png when matplotlib is available) to --out.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="GAN checkpoint dir holding step_* saves")
    p.add_argument("--captions-path", required=True)
    p.add_argument("--data-root", required=True,
                   help="real image directory (the training corpus)")
    p.add_argument("--n", type=int, default=256,
                   help="generated images per sampling seed")
    p.add_argument("--max-real", type=int, default=768)
    p.add_argument("--feature-batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", type=int, default=3,
                   help="independent sampling seeds per checkpoint; the "
                        "curve reports mean +/- spread over them (VERDICT "
                        "r4 Weak #5: a single-seed point can't rank "
                        "adjacent checkpoints)")
    p.add_argument("--out", default="fid_curve")
    return p.parse_args()


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.data.captions import CaptionHandler
    from attngan_tpu.data.dataset import Dataset, preprocess_pyramid
    from attngan_tpu.eval.fid import FIDEvaluator, activation_statistics, \
        frechet_distance
    from attngan_tpu.infer.sampler import Sampler, as_infer_state
    from attngan_tpu.train.checkpoint import (load_config_sidecar,
                                              restore_inference_state)
    from attngan_tpu.train.gan_trainer import GanTrainer

    steps = sorted(glob.glob(os.path.join(args.checkpoint, "step_*")))
    if not steps:
        raise SystemExit(f"no step_* checkpoints under {args.checkpoint}")

    handler = CaptionHandler(args.captions_path)
    sidecar = load_config_sidecar(args.checkpoint) or {}
    cfg = GanConfig(**{k: sidecar[k] for k in
                       ("gf_dim", "df_dim", "emb_dim", "seq_len",
                        "num_stages", "image_encoder") if k in sidecar},
                    compute_dtype=sidecar.get("compute_dtype", "bfloat16"))
    trainer = GanTrainer(cfg, vocab_size=handler.vocab_size)
    abstract = jax.eval_shape(lambda: trainer.init_state(seed=args.seed))

    # Fixed conditioning: the dataset's OWN captions (in-distribution), one
    # batch reused for every checkpoint so the curve isolates the params.
    names = sorted(handler.img2caption)[: args.n]
    captions = [handler.img2caption[n] for n in names]
    while len(captions) < args.n:           # tile if the corpus is small
        captions.append(captions[len(captions) % max(len(names), 1)])
    tokens, lengths = handler.preprocess(captions, max_seqlen=cfg.seq_len)
    tokens, lengths = jnp.asarray(tokens), jnp.asarray(lengths)
    keys = [jax.random.key(args.seed + s) for s in range(args.seeds)]

    # Real statistics, computed once.
    ds = Dataset(args.data_root, max_images=args.max_real)
    pix = np.stack([r.pixels for r in ds.records[: args.max_real]])
    flip = np.zeros((pix.shape[0],), bool)
    real256 = np.asarray(
        preprocess_pyramid(jnp.asarray(pix), jnp.asarray(flip))[256])
    ev = FIDEvaluator(batch_size=args.feature_batch)
    mu_r, sig_r = activation_statistics(ev.features(real256))
    print(f"real set: {real256.shape[0]} images from {args.data_root}",
          flush=True)

    sampler = Sampler(trainer, abstract)    # one jit cache for every ckpt
    res = cfg.resolutions[-1]
    curve = []
    for path in steps:
        state = as_infer_state(jax.device_put(
            restore_inference_state(path, abstract)))
        sampler.state = state
        fids = []
        for key in keys:   # independent noise draws, same captions + params
            fakes = np.asarray(
                sampler.generate_from_tokens(tokens, lengths, key))
            fakes = fakes.astype(np.float32) * 2.0 - 1.0  # -> trunk domain
            mu_f, sig_f = activation_statistics(ev.features(fakes))
            fids.append(frechet_distance(mu_r, sig_r, mu_f, sig_f))
        step = int(os.path.basename(path).split("_")[1])
        curve.append({
            "step": step,
            "fid": round(float(np.mean(fids)), 4),
            "fid_std": round(float(np.std(fids)), 4),
            "fid_seeds": [round(float(f), 4) for f in fids],
        })
        print(json.dumps(curve[-1]), flush=True)

    os.makedirs(args.out, exist_ok=True)
    summary = {"checkpoint": args.checkpoint, "n_fake": int(tokens.shape[0]),
               "n_seeds": args.seeds,
               "n_real": int(real256.shape[0]), "resolution": res,
               "units": "calibrated-random-feature (standard units need "
                        "converted torchvision weights)",
               "curve": curve,
               "decreasing": curve[0]["fid"] > curve[-1]["fid"]}
    with open(os.path.join(args.out, "fid_curve.json"), "w") as f:
        json.dump(summary, f, indent=2)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        xs = [c["step"] for c in curve]
        ax.errorbar(xs, [c["fid"] for c in curve],
                    yerr=[c.get("fid_std", 0.0) for c in curve],
                    marker="o", capsize=3)
        ax.set_xlabel("training step")
        ax.set_ylabel("FID (calibrated-random-feature units)")
        ax.set_title(f"FID vs training step (mean +/- std, "
                     f"{args.seeds} seeds)")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "fid_curve.png"), dpi=120)
    except ImportError:
        pass
    print(json.dumps({"first": curve[0], "last": curve[-1],
                      "decreasing": summary["decreasing"]}))


if __name__ == "__main__":
    main()
