"""VQ-bottleneck ablation at corpus scale: what does the discrete
bottleneck cost, and how much do the framework's beyond-reference
quantizers buy back?

QUALITY.md established that the generative decode path's FGD gap is set
by the token bottleneck, not by Part d's translation (c2g with
ground-truth tokens lands at the same FGD as the full chain). This
study ablates the bottleneck itself: for each quantizer config, Part b
is trained to convergence on the SAME cached motif corpus against the
SAME frozen Part-a teacher (reusing a completed quality_run out dir),
and fidelity is measured in the SHARED frozen DAE-latent frame space
(40-dim, per frame) so configs with different Part-b latent widths and
codebooks stay directly comparable:

  - recon FGD: full autoencoder pass (encode -> quantize (straight-
    through/soft output) -> teacher-seeded decode) vs the real held-out
    frames — the information the bottleneck+decoder retain.
  - token-decode FGD: decode from codebook[argmax token] ONLY, i.e.
    what the e2e generative chain could reach with a PERFECT Part d
    (ref decode mode: inference_text2embedding.py:488-519, rebuilt as
    models/seq_ae.rollout). For residual VQ this uses stage 0 only
    (the pipeline-compatible token, models/vq.VQResidual), and a
    separate all-stages row quantifies what a multi-token Part d
    would unlock.
  - floor: FGD(train frames, val frames) — real-motion noise floor.

Configs: the reference-parity GS-Soft at the production K=64, a larger
codebook (K=256), residual VQ (2 and 4 stages — beyond-reference,
PAPERS.md: RVQ/MoMask), and the non-VQ continuous twin as the upper
bound (the reference's Autoencoder_seq2seq, ref:
scripts/model/Autoencoder_VQVAE_model.py same module with VQ off).

Run AFTER benchmarks/quality_run.py (reuses its corpus + DAE):
    python benchmarks/quality_vq_ablation.py /tmp/quality_out
Writes <out>/metrics_vq_ablation.json and prints the table.
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os

import numpy as np


def _rvq_full_sum(params_vq: dict, flat: np.ndarray, stages: int
                  ) -> np.ndarray:
    """All-stages residual quantization (numpy, eval-only): stage s
    quantizes the residual left by stages <s (models/vq.VQResidual)."""
    resid = flat.astype(np.float64)
    total = np.zeros_like(resid)
    for s in range(stages):
        cb = np.asarray(params_vq["codebook" if s == 0
                                  else f"codebook_r{s}"], np.float64)
        d = ((resid ** 2).sum(1, keepdims=True) + (cb ** 2).sum(1)
             - 2.0 * resid @ cb.T)
        q = cb[np.argmin(d, axis=1)]
        total += q
        resid = resid - q
    return total.astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true",
                    help="smoke sizes (pair with a --fast quality_run)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.cluster.metrics import (frechet_distance,
                                                 token_perplexity)
    from gesture2vec_tpu.data.datasets import pose_windows
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae
    from gesture2vec_tpu.models.seq_ae import (_flatten_hidden,
                                               _unflatten_hidden)
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae,
                                                      train_seq_ae)

    logging.basicConfig(level=logging.INFO)
    print("backend:", jax.devices()[0].platform)

    fast = args.fast
    n_frames, rep = 20, 40
    hid = 64 if fast else 200
    bs = 32 if fast else 128
    codes = 32 if fast else 64
    epochs = 8 if fast else 80

    store = ClipStore(os.path.join(args.out, "corpus", "store", "train"))
    val_store = ClipStore(os.path.join(args.out, "corpus", "store",
                                       "val"))
    dae_ckpts = sorted(glob.glob(os.path.join(args.out, "dae",
                                              "dae_*_checkpoint_*.bin")))
    assert dae_ckpts, f"no DAE checkpoint under {args.out}/dae — run " \
                      f"benchmarks/quality_run.py first"
    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        dae_ckpts[-1], "DAE")

    train_wins = pose_windows(store, n_frames, n_frames // 2)
    val_wins = pose_windows(val_store, n_frames, n_frames // 2,
                            store.pose_mean, store.pose_std)
    lat_train = encode_windows_with_dae(dae, dae_vars, train_wins)
    lat_val = encode_windows_with_dae(dae, dae_vars, val_wins)
    print(f"windows: {lat_train.shape[0]} train, {lat_val.shape[0]} val")

    val_frames = lat_val.reshape(-1, rep)
    rng = np.random.default_rng(0)
    tr_frames = lat_train.reshape(-1, rep)
    tr_frames = tr_frames[rng.choice(tr_frames.shape[0],
                                     min(20000, tr_frames.shape[0]),
                                     replace=False)]
    floor = frechet_distance(tr_frames, val_frames)
    print(f"floor FGD (real train vs real val, DAE frame space): "
          f"{floor:.2f}")

    configs = [
        ("gssoft_K64", {}),                       # reference-parity prod
        ("gssoft_K256", dict(autoencoder_vq_components=4 * codes)),
        ("rvq2_K64", dict(autoencoder_vq_variant="rvq", rvq_stages=2)),
        ("rvq4_K64", dict(autoencoder_vq_variant="rvq", rvq_stages=4)),
        ("novq", dict(autoencoder_vq=False)),     # continuous twin
    ]

    results = {}
    for name, overrides in configs:
        base = dict(
            name=f"abl_{name}", model="seq2seq", hidden_size=hid,
            n_layers=2, dropout_prob=0.1, epochs=epochs, batch_size=bs,
            learning_rate=0.002, rep_learning_dim=rep, n_poses=n_frames,
            n_pre_poses=1, autoencoder_vq=True,
            autoencoder_vq_components=codes, random_seed=0,
            rvq_reestimate_every=(2 if fast else 10))
        base.update(overrides)
        cfg = load_config(base)
        state, hist = train_seq_ae(cfg, lat_train, lat_val)
        model = make_seq_ae(cfg)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        k = cfg.autoencoder_vq_components

        @jax.jit
        def forward(x):
            res = model.apply(variables, x, x, train=False)
            return res["outputs"]

        @jax.jit
        def hidden_of(x):
            _, dec_hidden = model.apply(variables, x,
                                        method=model.encode)
            # pipeline token ids = argmax of the quantizer's encodings
            # (models/seq_ae.tokens_from_hidden), NOT a raw distance
            # argmin — GS-Soft's soft assignment can rank differently
            vq_out, _ = model.apply(variables, dec_hidden,
                                    method=model.quantize)
            return dec_hidden, jnp.argmax(vq_out.encodings, axis=-1)

        @jax.jit
        def rollout_from(hid_lbh, seed):
            return model.apply(variables, hid_lbh, seed,
                               method=model.rollout)

        x = jnp.asarray(lat_val)
        recon = np.asarray(forward(x))
        row = {
            "val_loss": float(hist["val_loss"][-1]),
            "recon_mse": float(np.mean((recon - lat_val) ** 2)),
            "fgd_recon": frechet_distance(recon.reshape(-1, rep),
                                          val_frames),
        }

        if cfg.autoencoder_vq:
            dec_hidden, tok_dev = hidden_of(x)
            tokens = np.asarray(tok_dev)
            flat = np.asarray(_flatten_hidden(dec_hidden,
                                              model.vq_flatten))
            cb0 = np.asarray(state.params["vq_layer"]["codebook"])
            hid_tok = _unflatten_hidden(jnp.asarray(cb0[tokens]),
                                        dec_hidden.shape,
                                        model.vq_flatten)
            roll = np.asarray(rollout_from(hid_tok, x[:, 0]))
            row.update({
                "codebook_perplexity": float(hist["perplexity"][-1]),
                "val_token_perplexity": token_perplexity(tokens, k),
                "codes_used": int(np.unique(tokens).size),
                "codes_total": k,
                "fgd_token_decode": frechet_distance(
                    roll.reshape(-1, rep), val_frames),
            })
            if cfg.autoencoder_vq_variant == "rvq":
                full = _rvq_full_sum(state.params["vq_layer"], flat,
                                     cfg.rvq_stages)
                hid_full = _unflatten_hidden(jnp.asarray(full),
                                             dec_hidden.shape,
                                             model.vq_flatten)
                roll_f = np.asarray(rollout_from(hid_full, x[:, 0]))
                row["fgd_token_decode_all_stages"] = frechet_distance(
                    roll_f.reshape(-1, rep), val_frames)
        results[name] = row
        print(f"{name}: " + ", ".join(
            f"{k2}={v:.3f}" if isinstance(v, float) else f"{k2}={v}"
            for k2, v in row.items()))

    payload = {"floor_fgd": floor, "space": "frozen DAE latent frames "
               f"(dim {rep})", "epochs": epochs, "hidden": hid,
               "base_codes": codes, "results": results}
    out_path = os.path.join(args.out, "metrics_vq_ablation.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out_path)

    hdr = (f"{'config':<14}{'val_loss':>9}{'mse':>8}{'fgd_recon':>11}"
           f"{'fgd_tokdec':>11}{'ppl':>7}{'used':>6}")
    print("\n" + hdr)
    for name, r in results.items():
        print(f"{name:<14}{r['val_loss']:>9.3f}{r['recon_mse']:>8.4f}"
              f"{r['fgd_recon']:>11.2f}"
              f"{r.get('fgd_token_decode', float('nan')):>11.2f}"
              f"{r.get('val_token_perplexity', float('nan')):>7.2f}"
              f"{r.get('codes_used', 0):>6}")
    print(f"{'floor':<14}{'':>9}{'':>8}{floor:>11.2f}")


if __name__ == "__main__":
    main()
