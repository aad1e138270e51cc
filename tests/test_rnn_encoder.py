"""BiLSTM encoder vs torch's packed bidirectional LSTM (the reference's
RNNEncoder engine, networks/rnn_encoder.py:40-47,86-95)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

from attngan_tpu.models.rnn_encoder import BiLSTMEncoder

VOCAB, EMB, HID, B, L = 50, 12, 16, 4, 7  # HID = total width, 8 per direction


def _torch_reference(x_np, lengths):
    """Torch BiLSTM over pre-embedded input with pack/pad semantics."""
    lstm = torch.nn.LSTM(EMB, HID // 2, num_layers=1, batch_first=True,
                         bidirectional=True)
    x = torch.from_numpy(x_np)
    packed = pack_padded_sequence(x, lengths, batch_first=True,
                                  enforce_sorted=False)
    out, (h, c) = lstm(packed)
    out = pad_packed_sequence(out, batch_first=True, total_length=L)[0]
    sent = h.transpose(0, 1).contiguous().view(-1, HID)
    return lstm, out.detach().numpy(), sent.detach().numpy()


def _port_torch_weights(lstm, params):
    """Copy torch LSTM weights into our param tree (b = b_ih + b_hh)."""
    new = dict(params)
    for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
        w_ih = getattr(lstm, f"weight_ih_l0{suffix}").detach().numpy().T
        w_hh = getattr(lstm, f"weight_hh_l0{suffix}").detach().numpy().T
        b = (getattr(lstm, f"bias_ih_l0{suffix}") +
             getattr(lstm, f"bias_hh_l0{suffix}")).detach().numpy()
        new[f"w_ih_{d}"] = jnp.asarray(w_ih)
        new[f"w_hh_{d}"] = jnp.asarray(w_hh)
        new[f"b_{d}"] = jnp.asarray(b)
    return new


def test_bilstm_matches_torch_packed(rng):
    lengths = [7, 5, 2, 3]  # ragged, unsorted (enforce_sorted=False)
    x_np = rng.standard_normal((B, L, EMB)).astype(np.float32)
    lstm, t_out, t_sent = _torch_reference(x_np, lengths)

    # Inject the pre-embedded input through the embedding table:
    # captions[b, t] = b * L + t  ->  embedding[b * L + t] = x_np[b, t].
    big_vocab = B * L
    emb_table = x_np.reshape(big_vocab, EMB)
    enc2 = BiLSTMEncoder(vocab_size=big_vocab, emb_dim=EMB, hidden_dim=HID,
                         dropout=0.0)
    caps2 = jnp.arange(big_vocab, dtype=jnp.int32).reshape(B, L)
    v2 = enc2.init(jax.random.key(0), caps2, jnp.asarray(lengths))
    p2 = _port_torch_weights(lstm, v2["params"])
    p2["embedding"] = jnp.asarray(emb_table)

    word_embs, sent_embs = enc2.apply(
        {"params": p2}, caps2, jnp.asarray(lengths), train=False
    )
    np.testing.assert_allclose(np.asarray(word_embs), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sent_embs), t_sent, rtol=1e-4, atol=1e-5)


def test_padded_positions_are_zero(rng):
    enc = BiLSTMEncoder(vocab_size=VOCAB, emb_dim=EMB, hidden_dim=HID)
    caps = jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32)
    lengths = jnp.asarray([3, 7, 1, 4])
    variables = enc.init(jax.random.key(0), caps, lengths)
    word_embs, _ = enc.apply(variables, caps, lengths, train=False)
    for b, n in enumerate([3, 7, 1, 4]):
        np.testing.assert_allclose(np.asarray(word_embs[b, n:]), 0.0)


def test_dropout_only_in_train_mode(rng):
    enc = BiLSTMEncoder(vocab_size=VOCAB, emb_dim=EMB, hidden_dim=HID, dropout=0.5)
    caps = jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32)
    lengths = jnp.full((B,), L)
    variables = enc.init(jax.random.key(0), caps, lengths)
    w1, _ = enc.apply(variables, caps, lengths, train=False)
    w2, _ = enc.apply(variables, caps, lengths, train=False)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))
    w3, _ = enc.apply(variables, caps, lengths, train=True,
                      rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(w1), np.asarray(w3))
