#!/usr/bin/env python
"""Show the DAMSM same-class exclusion mask is ACTIVE on a real corpus.

VERDICT r4 Weak #6: the r4 e2e corpus had ~500 distinct class ids over 385
crops, so the loss-side same-class masking (reference words_loss.py:44-47,
sentence_loss.py:17-25; ported in losses/damsm.py) was unit-tested but
effectively inert in the only real end-to-end run. On a corpus clustered
with a CAPPED ladder (e.g. pretrain_damsm.py --cluster --max-vocab-size 32)
many records share a class id; this tool takes real batches from that
corpus through a trained DAMSM checkpoint and reports, per batch:

  * how many off-diagonal (text, image) pairs the class mask excludes;
  * the word+sentence loss WITH the mask (product semantics) vs ABLATED
    (class_ids=None -> no exclusions, every mismatched pair a negative).

A nonzero collision count with differing losses is direct evidence the
exclusion path executes on real data. Prints one JSON line per batch and a
summary line; exits nonzero if no batch had a collision.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="DAMSM checkpoint dir (holding step_*)")
    p.add_argument("--captions-path", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.data.streaming import open_dataset
    from attngan_tpu.losses.damsm import damsm_loss
    from attngan_tpu.train.checkpoint import (latest_checkpoint,
                                              load_config_sidecar,
                                              restore_checkpoint)
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    dataset = open_dataset(args.data_root)
    dataset.load_captions_and_class_ids(args.captions_path)
    dataset.build_vocab()

    sidecar = load_config_sidecar(args.checkpoint) or {}
    cfg = DamsmConfig(**{k: sidecar[k] for k in
                         ("emb_dim", "image_encoder", "batch_size")
                         if k in sidecar})
    trainer = DamsmTrainer(cfg, vocab_size=dataset.vocab.n_words,
                           seq_len=max(dataset.max_seqlen, 1))
    with jax.default_device(jax.devices("cpu")[0]):
        template = trainer.init_state(seed=0)
    ckpt = latest_checkpoint(args.checkpoint) or args.checkpoint
    # template is CPU-committed (eager init through the remote tunnel is
    # pathological) and restore follows it; a no-target device_put is a
    # no-op for committed arrays, so pin the accelerator explicitly —
    # otherwise the jit (and its Pallas words-loss kernel) lowers for CPU.
    state = jax.device_put(restore_checkpoint(ckpt, template),
                           jax.devices()[0])

    @jax.jit
    def losses_with_and_without_mask(state, batch):
        # encode_text/encode_image are pure module applies — traced here so
        # the whole evaluation is ONE device program (an eager apply
        # dispatches thousands of ops through the remote tunnel)
        regions, cnn_code = trainer.encode_image(state, batch["img256"])
        word_embs, sent_embs = trainer.encode_text(
            state, batch["tokens"], batch["lengths"])
        labels = jnp.arange(batch["tokens"].shape[0])
        from attngan_tpu.data.dataset import word_mask

        mask = word_mask(batch["lengths"], batch["tokens"].shape[1])
        masked, parts_m, _ = damsm_loss(
            regions, cnn_code, word_embs, sent_embs, labels, mask,
            batch["class_ids"], cfg.gamma1, cfg.gamma2, cfg.gamma3,
            cfg.wlambda, cfg.slambda)
        ablated, parts_a, _ = damsm_loss(
            regions, cnn_code, word_embs, sent_embs, labels, mask,
            None, cfg.gamma1, cfg.gamma2, cfg.gamma3,
            cfg.wlambda, cfg.slambda)
        return masked, ablated, parts_m, parts_a

    total_collisions = 0
    rows = []
    it = dataset.iter_batches(args.batch_size, seed=args.seed)
    for i, host in enumerate(it):
        if i >= args.batches:
            break
        batch = dataset.device_batch(host)
        cids = np.asarray(host["class_ids"])
        collisions = int((cids[:, None] == cids[None, :]).sum() - len(cids))
        total_collisions += collisions
        masked, ablated, pm, pa = losses_with_and_without_mask(state, batch)
        row = {
            "batch": i,
            "excluded_offdiag_pairs": collisions,
            "distinct_classes": int(len(np.unique(cids))),
            "loss_masked": round(float(masked), 5),
            "loss_ablated": round(float(ablated), 5),
            "delta": round(float(ablated) - float(masked), 5),
            "words_delta": round(float(pa["words_loss"])
                                 - float(pm["words_loss"]), 5),
            "sent_delta": round(float(pa["sentence_loss"])
                                - float(pm["sentence_loss"]), 5),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    active = total_collisions > 0 and any(r["delta"] != 0.0 for r in rows)
    print(json.dumps({
        "summary": "same-class exclusion mask "
                   + ("ACTIVE on real data" if active else "NOT exercised"),
        "total_excluded_pairs": total_collisions,
        "batches": len(rows),
    }))
    sys.exit(0 if active else 1)


if __name__ == "__main__":
    main()
