"""Full-model parity: reference-architecture torch models vs our flax
models with converted weights. This is the BASELINE.md contract: >= 99%
VQ token agreement (we assert 100%) and matching motion trajectories.

The torch models below are assembled from torch primitives following
the reference architecture (module names arranged to produce
reference-style state_dict keys); the reference's eval-time 0.95 step
dropout is omitted on both sides so trajectories are deterministic.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gesture2vec_tpu.compat.torch_import import (convert_dae_state,
                                                 convert_seq_ae_state,
                                                 convert_text2token_state)
from gesture2vec_tpu.models.dae import DAE
from gesture2vec_tpu.models.seq_ae import SeqVQAutoencoder
from gesture2vec_tpu.models.text2token import Text2Token

REP, HID, L, K, T = 24, 32, 2, 50, 10


# ---------------------------------------------------------------- torch ref
class _TorchEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.in_layer = nn.Linear(REP, HID)
        self.gru = nn.GRU(HID, HID, L, bidirectional=True)

    def forward(self, xs):  # (T, B, D)
        outs, hidden = self.gru(self.in_layer(xs))
        return outs[:, :, :HID] + outs[:, :, HID:], hidden


class _TorchVQ(nn.Module):
    def __init__(self):
        super().__init__()
        self.mean_layer = nn.Linear(L * HID, L * HID)
        self.logvar_layer = nn.Linear(L * HID, K)
        self._embedding = nn.Embedding(K, L * HID)

    def forward(self, hidden):  # (L, B, H), torch_view flattening
        flat = hidden.reshape(-1, L * HID)
        proj = self.mean_layer(flat)
        zlv = self.logvar_layer(proj)
        e = self._embedding.weight
        d = (proj.pow(2).sum(1, keepdim=True) + e.pow(2).sum(1)
             - 2 * proj @ e.t())
        smooth = torch.exp(zlv) ** -2
        prob = torch.exp(-(d / 400) * 0.5 * smooth) / torch.sqrt(smooth)
        probs = prob / prob.sum(1, keepdim=True)
        q = (probs @ e).reshape(hidden.shape)
        return q, probs


class _TorchDecoderInner(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre_linear = nn.Sequential(nn.Linear(REP, HID),
                                        nn.BatchNorm1d(HID),
                                        nn.ReLU(inplace=True))
        self.gru = nn.GRU(HID, HID, L)
        self.out_layer = nn.Linear(HID, REP)

    def forward(self, x, hidden):
        h = self.pre_linear(x)
        o, hidden = self.gru(h.unsqueeze(0), hidden)
        return self.out_layer(o[0]), hidden


class _TorchDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.decoder = _TorchDecoderInner()


class TorchSeqVQ(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _TorchEncoder()
        self.vq_layer = _TorchVQ()
        self.decoder = _TorchDecoder()

    def forward(self, poses, n_pre=1):  # (B, T, D)
        xs = poses.transpose(0, 1)
        enc_outs, enc_hidden = self.encoder(xs)
        dec_hidden = enc_hidden[:L].contiguous()
        q, probs = self.vq_layer(dec_hidden)
        dec_hidden = q.contiguous()
        outs = [xs[0]]
        inp = xs[0]
        for t in range(1, T):
            out, dec_hidden = self.decoder.decoder(inp, dec_hidden)
            outs.append(out)
            inp = xs[t] if t < n_pre else out
        return torch.stack(outs, 1), probs


def test_seq_ae_token_agreement_and_trajectory(rng):
    torch.manual_seed(0)
    ref = TorchSeqVQ().eval()
    x = rng.normal(size=(16, T, REP)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_probs = ref(torch.from_numpy(x))
    ref_tokens = ref_probs.argmax(1).numpy()

    params, batch_stats = convert_seq_ae_state(
        {k: v.numpy() for k, v in ref.state_dict().items()}, n_layers=L)
    model = SeqVQAutoencoder(rep_dim=REP, hidden_size=HID, n_layers=L,
                             n_frames=T, n_pre_poses=1, use_vq=True,
                             vq_components=K, vq_flatten="torch_view",
                             eval_step_dropout=False)
    variables = {"params": params, "batch_stats": batch_stats}
    res = model.apply(variables, jnp.asarray(x), jnp.asarray(x),
                      train=False)

    tokens = np.argmax(np.asarray(res["vq"].encodings), axis=1)
    agreement = (tokens == ref_tokens).mean()
    assert agreement == 1.0, f"token agreement {agreement}"

    np.testing.assert_allclose(np.asarray(res["outputs"]),
                               ref_out.numpy(), atol=5e-4)


def test_dae_parity(rng):
    torch.manual_seed(1)

    class TorchDAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Sequential(nn.Linear(135, 40), nn.ReLU())
            self.decoder = nn.Sequential(nn.Linear(40, 135))

        def forward(self, x):
            return self.decoder(self.encoder(x))

    ref = TorchDAE().eval()
    x = rng.normal(size=(64, 135)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    params = convert_dae_state({k: v.numpy()
                                for k, v in ref.state_dict().items()})
    model = DAE(motion_dim=135, latent_dim=40)
    out = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)


class _TorchTextEncoder(nn.Module):
    def __init__(self, n_words):
        super().__init__()
        self.embedding = nn.Embedding(n_words, 16)
        self.gru = nn.GRU(16, HID, L, bidirectional=True)


class _TorchT2TInner(nn.Module):
    def __init__(self):
        super().__init__()
        self.embedding = nn.Embedding(K, HID)
        self.attn = _TorchAttn()
        self.pre_linear = nn.Sequential(nn.Linear(2 * HID, HID),
                                        nn.BatchNorm1d(HID),
                                        nn.ReLU(inplace=True))
        self.gru = nn.GRU(HID, HID, L)
        self.out = nn.Linear(HID, K)


class _TorchAttn(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn = nn.Linear(2 * HID, HID)
        self.v = nn.Parameter(torch.randn(HID) / HID ** 0.5)


class _TorchT2TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.decoder = _TorchT2TInner()


class TorchT2T(nn.Module):
    """Reference text2embedding (GRU encoder path) with packed-sequence
    semantics, eval mode, attention decode over tokens."""

    def __init__(self, n_words, n_steps, n_pre):
        super().__init__()
        self.encoder = _TorchTextEncoder(n_words)
        self.decoder = _TorchT2TDecoder()
        self.n_steps = n_steps
        self.n_pre = n_pre

    def forward(self, ids, lengths, targets):
        emb = self.encoder.embedding(ids).transpose(0, 1)
        packed = nn.utils.rnn.pack_padded_sequence(
            emb, lengths, enforce_sorted=False)
        outs, hidden = self.encoder.gru(packed)
        outs, _ = nn.utils.rnn.pad_packed_sequence(outs)
        outs = outs[:, :, :HID] + outs[:, :, HID:]
        dec_hidden = hidden[:L].contiguous()

        d = self.decoder.decoder
        token = targets[:, 0]
        logits_seq = [F.one_hot(token, K).float()]
        for t in range(1, self.n_steps):
            tok_in = targets[:, t - 1] if t - 1 < self.n_pre else token
            x = d.embedding(tok_in)
            q = dec_hidden[-1].unsqueeze(0).expand(outs.shape[0], -1, -1)
            energy = torch.tanh(d.attn.attn(torch.cat([q, outs], dim=2)))
            scores = torch.einsum("tbh,h->bt", energy, d.attn.v)
            w = torch.softmax(scores, dim=1)
            ctx = torch.einsum("bt,tbh->bh", w, outs)
            h = d.pre_linear(torch.cat([x, ctx], dim=1))
            o, dec_hidden = d.gru(h.unsqueeze(0), dec_hidden)
            logits = d.out(o[0])
            token = logits.argmax(1)
            logits_seq.append(logits)
        return torch.stack(logits_seq, 1)


def test_text2token_parity(rng):
    torch.manual_seed(2)
    n_words, n_steps, n_pre, maxw = 40, 6, 2, 12
    ref = TorchT2T(n_words, n_steps, n_pre).eval()

    lengths = rng.integers(3, maxw, size=8).astype(np.int64)
    ids = np.zeros((8, maxw), np.int64)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(4, n_words, size=ln)
    targets = rng.integers(0, K, size=(8, n_steps)).astype(np.int64)

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(ids),
                         torch.from_numpy(lengths),
                         torch.from_numpy(targets)).numpy()

    params, batch_stats = convert_text2token_state(
        {k: v.numpy() for k, v in ref.state_dict().items()}, n_layers=L)
    model = Text2Token(n_words=n_words, n_tokens=K, hidden_size=HID,
                       n_layers=L, n_steps=n_steps, n_pre_poses=n_pre,
                       dropout=0.0, word_embed_size=16,
                       encoder_type="gru", use_attention=True)
    res = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(ids.astype(np.int32)),
                      jnp.asarray(lengths.astype(np.int32)),
                      jnp.asarray(targets.astype(np.int32)), train=False)
    ours = np.asarray(res["logits"])
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4)
    # predicted token sequences identical
    np.testing.assert_array_equal(ours.argmax(-1), ref_logits.argmax(-1))


def test_import_checkpoint_roundtrip(rng, tmp_path):
    """Reference-style torch checkpoint file -> our format -> loaded
    model produces identical tokens."""
    import argparse

    from gesture2vec_tpu.cli.tools import import_reference_checkpoint
    from gesture2vec_tpu.train import checkpoints

    torch.manual_seed(3)
    ref = TorchSeqVQ().eval()
    args = argparse.Namespace(
        name="ref_vq", model="seq2seq", hidden_size=HID, n_layers=L,
        dropout_prob=0.2, autoencoder_vq="True",
        autoencoder_vq_components=K, autoencoder_vae="False",
        autoencoder_att="False", autoencoder_conditioned="True",
        n_poses=T, n_pre_poses=1, rep_learning_dim=REP, random_seed=0,
        epochs=1, batch_size=8, learning_rate=5e-4)
    torch_path = str(tmp_path / "ref_checkpoint_020.bin")
    torch.save({"args": args, "epoch": 20, "pose_dim": REP,
                "lang_model": None, "gen_dict": ref.state_dict()},
               torch_path)

    out_path = str(tmp_path / "converted.bin")
    import_reference_checkpoint(torch_path, out_path, "autoencoder_vq")

    model, variables, payload = checkpoints.load_checkpoint_and_model(
        out_path, "autoencoder_vq")
    assert payload["epoch"] == 20

    x = rng.normal(size=(8, T, REP)).astype(np.float32)
    with torch.no_grad():
        _, ref_probs = ref(torch.from_numpy(x))
    # the converted model must be built in parity (torch_view) mode for
    # token agreement; rebuild explicitly
    from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae
    pmodel = make_seq_ae(payload["config"], parity=True)
    enc_hid = pmodel.apply(variables, jnp.asarray(x),
                           method=pmodel.encode)[1]
    vq_out, _ = pmodel.apply(variables, enc_hid, method=pmodel.quantize)
    tokens = np.argmax(np.asarray(vq_out.encodings), axis=1)
    np.testing.assert_array_equal(tokens, ref_probs.argmax(1).numpy())
