"""Benchmark: flagship gesture-tokenizer round-trip throughput.

Measures the Part-b SeqVQAutoencoder forward pass (encode -> GS-Soft VQ
-> 20-step autoregressive GRU decode) in motion frames/sec on the
default JAX backend (TPU under the driver), and compares against an
equivalent PyTorch implementation run on CPU (the reference is
pure-PyTorch; its published environment is CPU-compatible and no GPU
numbers are committed - see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import numpy as np

# production shapes (config/VQ-VAE.yml: hidden 200, n_layers 2, 512 codes,
# 20-frame chunks, DAE latent 40)
B, T, D, H, L, K = 128, 20, 40, 200, 2, 512
WARMUP, ITERS = 3, 10


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp
    from gesture2vec_tpu.models.seq_ae import SeqVQAutoencoder

    model = SeqVQAutoencoder(rep_dim=D, hidden_size=H, n_layers=L,
                             n_frames=T, n_pre_poses=1, use_vq=True,
                             vq_components=K)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, T, D)).astype(np.float32))
    variables = model.init({"params": rng,
                            "dropout": jax.random.fold_in(rng, 1)},
                           x, x, train=False)

    @jax.jit
    def fwd(v, xs):
        res = model.apply(v, xs, xs, train=False)
        return res["outputs"], res["vq"].encodings

    for _ in range(WARMUP):
        out = fwd(variables, x)
        jax.block_until_ready(out)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fwd(variables, x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return B * T / float(np.median(times))


def bench_torch_cpu() -> float:
    """Equivalent computation with torch modules on CPU."""
    import torch
    import torch.nn as nn

    class TorchTokenizer(nn.Module):
        def __init__(self):
            super().__init__()
            self.in_layer = nn.Linear(D, H)
            self.enc = nn.GRU(H, H, L, bidirectional=True)
            self.codebook = nn.Parameter(torch.randn(K, L * H))
            self.mean_layer = nn.Linear(L * H, L * H)
            self.logvar_layer = nn.Linear(L * H, K)
            self.pre_linear = nn.Linear(D, H)
            self.pre_bn = nn.BatchNorm1d(H)
            self.dec = nn.GRU(H, H, L)
            self.out_layer = nn.Linear(H, D)

        def forward(self, x):  # x (B, T, D)
            xs = x.transpose(0, 1)
            enc_out, hidden = self.enc(self.in_layer(xs))
            dec_h = hidden[:L].contiguous()
            flat = dec_h.transpose(0, 1).reshape(x.shape[0], L * H)
            proj = self.mean_layer(flat)
            zlv = self.logvar_layer(proj)
            d = (proj.pow(2).sum(1, keepdim=True)
                 + self.codebook.pow(2).sum(1)
                 - 2 * proj @ self.codebook.t())
            smooth = torch.exp(zlv) ** -2
            prob = torch.exp(-(d / 400) * 0.5 * smooth) / torch.sqrt(smooth)
            probs = prob / prob.sum(1, keepdim=True)
            q = probs @ self.codebook
            dec_h = q.reshape(x.shape[0], L, H).transpose(0, 1).contiguous()
            outs = [xs[0]]
            inp = xs[0]
            for _ in range(1, T):
                h = torch.relu(self.pre_bn(self.pre_linear(inp)))
                o, dec_h = self.dec(h.unsqueeze(0), dec_h)
                inp = self.out_layer(o[0])
                outs.append(inp)
            return torch.stack(outs, 1), probs

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = TorchTokenizer().eval()
    x = torch.randn(B, T, D)
    with torch.no_grad():
        for _ in range(WARMUP):
            model(x)
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    return B * T / float(np.median(times))


def main():
    jax_fps = bench_jax()
    torch_fps = bench_torch_cpu()
    print(json.dumps({
        "metric": "gesture tokenizer fwd (encode+VQ+decode) throughput",
        "value": round(jax_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(jax_fps / torch_fps, 2),
    }))


if __name__ == "__main__":
    main()
