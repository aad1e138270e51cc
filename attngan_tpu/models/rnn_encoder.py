"""Bidirectional-LSTM text encoder (TPU-native RNNEncoder).

Reference: networks/rnn_encoder.py:12-96 — nn.Embedding(vocab, 300) with
U(-0.1, 0.1) init, dropout(0.5), and a 1-layer bidirectional cuDNN LSTM over
pack_padded_sequence'd captions. Word embeddings are the per-step outputs
(zero at padded steps), the sentence embedding is the concat of each
direction's final hidden state.

Here the packed/ragged machinery is replaced by static-shape ``lax.scan``
with a length mask — the idiomatic XLA form:

* the input projection of every timestep is hoisted into ONE large matmul
  (B*L, E) @ (E, 4H) so the MXU sees a single big contraction; the scan body
  only does the small (B, H) @ (H, 4H) recurrent matmul;
* at padded steps the carry is frozen (``where(t < length, new, old)``) and
  the step output is zeroed, which reproduces pack_padded_sequence semantics
  exactly: the backward direction consumes padding first (frozen zero carry)
  and finishes at t=0, so its final hidden equals torch's.

Gate order and cell math follow the LSTM convention torch uses
(i, f, g, o; c' = f*c + i*g; h' = o*tanh(c')) so converted weights verify.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilstm_scan(
    x_proj: jax.Array,    # (L, 2, B, 4H) input projection + biases;
                          # dir 0 = forward order, dir 1 = REVERSED order
    w_hh: jax.Array,      # (2, H, 4H) per-direction recurrent weights
    lengths: jax.Array,   # (B,) int32 valid lengths
) -> Tuple[jax.Array, jax.Array]:
    """Both directions in ONE scan. Returns (outputs (L, 2, B, H) with dir 1
    still in reversed order, final hidden (2, B, H)).

    Merging the directions halves the number of scan steps and doubles the
    recurrent matmul's row count ((2B, H) worth of rows per step) — the scan
    is dispatch-dominated at L <= 15, so fewer/fatter steps win. The scan is
    also fully unrolled (captions are tiny), removing loop overhead
    entirely.
    """
    seq_len, _, batch, four_h = x_proj.shape
    hidden = four_h // 4

    fwd_t = jnp.arange(seq_len, dtype=jnp.int32)
    bwd_t = jnp.arange(seq_len - 1, -1, -1, dtype=jnp.int32)
    time = jnp.stack([fwd_t, bwd_t], axis=1)           # (L, 2)

    def step(carry, inp):
        h, c = carry                                   # (2, B, H) each
        t, xp = inp                                    # (2,), (2, B, 4H)
        gates = xp + jnp.einsum("dbh,dhf->dbf", h, w_hh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        valid = (t[:, None] < lengths[None, :])[..., None]   # (2, B, 1)
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        y = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        return (h, c), y

    init = (
        jnp.zeros((2, batch, hidden), x_proj.dtype),
        jnp.zeros((2, batch, hidden), x_proj.dtype),
    )
    (h_final, _), ys = jax.lax.scan(step, init, (time, x_proj),
                                    unroll=seq_len)
    return ys, h_final


class BiLSTMEncoder(nn.Module):
    """Text encoder: captions (B, L) int32 + lengths (B,) ->
    (word_embs (B, L, hidden_dim), sent_embs (B, hidden_dim)).

    ``hidden_dim`` is the TOTAL width; each direction gets hidden_dim // 2
    (reference rnn_encoder.py:30).
    """

    vocab_size: int
    emb_dim: int = 300
    hidden_dim: int = 256
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        captions: jax.Array,       # (B, L) int32 token ids
        lengths: jax.Array,        # (B,) int32
        train: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        assert self.hidden_dim % 2 == 0
        h = self.hidden_dim // 2

        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.1, 0.1),
            (self.vocab_size, self.emb_dim),
        )
        x = jnp.take(embedding, captions, axis=0)          # (B, L, E)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H)) for every weight/bias.
        bound = 1.0 / jnp.sqrt(jnp.asarray(h, jnp.float32))
        uinit = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        # Param creation order matches the pre-merge per-direction loop —
        # flax derives param RNG streams from creation ORDER, so this keeps
        # fresh inits (and the golden fingerprints) bit-identical.
        params = {}
        for direction in ("fwd", "bwd"):
            params[f"w_ih_{direction}"] = self.param(
                f"w_ih_{direction}", uinit, (self.emb_dim, 4 * h))
            params[f"w_hh_{direction}"] = self.param(
                f"w_hh_{direction}", uinit, (h, 4 * h))
            params[f"b_{direction}"] = self.param(
                f"b_{direction}", uinit, (4 * h,))
        w_ih = jnp.stack([params["w_ih_fwd"], params["w_ih_bwd"]])  # (2,E,4H)
        w_hh = jnp.stack([params["w_hh_fwd"], params["w_hh_bwd"]])  # (2,H,4H)
        b = jnp.stack([params["b_fwd"], params["b_bwd"]])           # (2,4H)

        # Hoist BOTH directions' input projections into one MXU matmul.
        xp = (
            jnp.einsum("ble,def->bldf", x, w_ih,
                       preferred_element_type=jnp.float32)
            + b[None, None]
        ).transpose(1, 2, 0, 3)                            # (L, 2, B, 4H)
        # Direction 1 consumes the sequence reversed. Reversal is a GATHER
        # (take along the time axis), not jnp.flip: the rev HLO's fusion
        # with this graph's backward crashes the TPU compiler
        # (fusion_emitter "Check failed: window.pad_low[i] == 0 (-7 vs 0)"
        # in ReverseInput::TransformWindow); gather lowers cleanly.
        seq_len = xp.shape[0]
        rev = jnp.arange(seq_len - 1, -1, -1)
        xp = jnp.stack([xp[:, 0], jnp.take(xp[:, 1], rev, axis=0)], axis=1)
        ys, h_final = _bilstm_scan(xp, w_hh, lengths.astype(jnp.int32))

        word_embs = jnp.concatenate(
            [ys[:, 0], jnp.take(ys[:, 1], rev, axis=0)],
            axis=-1).transpose(1, 0, 2)                    # (B, L, 2H)
        sent_embs = jnp.concatenate([h_final[0], h_final[1]], axis=-1)
        return word_embs, sent_embs
