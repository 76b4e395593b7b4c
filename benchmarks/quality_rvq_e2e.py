"""End-to-end quality of the multi-stage residual-VQ chain (beyond the
reference) vs the committed reference-parity chain.

QUALITY.md pinned the generative decode mode's ceiling on the token
bottleneck: with perfect tokens the c2g/ablation decode lands at the
same FGD as the full chain, and benchmarks/quality_vq_ablation.py
showed a (collapse-fixed) residual-VQ tokenizer decoding from the FULL
stage sum cuts that ceiling roughly in half. This harness proves the
same end to end: it trains an rvq Part b (2 stages) and a token_stages=2
Part d (models/text2token multi-head; decode rebuilds the stage-sum
hidden, infer/text2gesture) on the SAME cached corpus + frozen Part-a
teacher as the committed run, then evaluates BOTH chains in one
session:

  - the chain-internal reference battery (token metrics are comparable
    across chains; the seq-latent FGD is each chain's own space, so its
    x-floor ratio is the cross-chain number);
  - a shared-space head-to-head: generated frames re-encoded by the
    SAME frozen DAE, Frechet distance per 40-dim frame vs the real
    held-out frames — directly comparable between chains (the
    committed gssoft checkpoints are re-evaluated here in-session).

Run AFTER benchmarks/quality_run.py:
    python benchmarks/quality_rvq_e2e.py /tmp/quality_out
Writes <out>/metrics_rvq_e2e.json.
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os

import numpy as np

from quality_run import eval_generated_vs_gt  # noqa: E402 (sibling)


def dae_frame_fgd(gen_frames_list, dae, dae_vars, store, val_frames_lat,
                  n_frames_chunk):
    """Generated frames -> frozen-DAE latents -> Frechet distance vs the
    real val frames in the same 40-dim space (the ablation's shared
    metric, benchmarks/quality_vq_ablation.py)."""
    from gesture2vec_tpu.cluster.metrics import frechet_distance
    from gesture2vec_tpu.data.datasets import normalize
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae

    lats = []
    for gf in gen_frames_list:
        gfn = normalize(np.asarray(gf), store.pose_mean, store.pose_std)
        n_chunks = gfn.shape[0] // n_frames_chunk
        chunks = gfn[:n_chunks * n_frames_chunk].reshape(
            n_chunks, n_frames_chunk, -1)
        lats.append(encode_windows_with_dae(dae, dae_vars, chunks)
                    .reshape(-1, val_frames_lat.shape[1]))
    gen_lat = np.concatenate(lats, axis=0)
    return float(frechet_distance(gen_lat, val_frames_lat))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--stages", type=int, default=2,
                    help="residual-VQ stage count for BOTH the rvq "
                         "Part b and the multi-stage Part d (the "
                         "ablation's 4-stage bottleneck halves the "
                         "2-stage decode ceiling again; default 2 = "
                         "the committed chain)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.cluster.metrics import frechet_distance
    from gesture2vec_tpu.data.datasets import pose_windows
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae,
                                                      train_seq_ae)
    from gesture2vec_tpu.train.text2token_trainer import (
        make_text2token, train_text2token)

    logging.basicConfig(level=logging.INFO)
    print("backend:", jax.devices()[0].platform)

    fast = args.fast
    suffix = "" if args.stages == 2 else f"_s{args.stages}"
    rvq_dir, t2t_dir = "vq_rvq" + suffix, "t2t_rvq" + suffix
    n_frames, rep, fps, sent_len = 20, 40, 20, 120
    hid = 64 if fast else 200
    codes = 32 if fast else 64
    bs_b = 32 if fast else 128
    bs_d = 4 if fast else 32

    store = ClipStore(os.path.join(args.out, "corpus", "store", "train"))
    val_store = ClipStore(os.path.join(args.out, "corpus", "store",
                                       "val"))
    dae_ckpts = sorted(glob.glob(os.path.join(args.out, "dae",
                                              "dae_*_checkpoint_*.bin")))
    assert dae_ckpts, "run benchmarks/quality_run.py first"
    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        dae_ckpts[-1], "DAE")

    # shared-space floor + real val frames (40-dim DAE latents)
    train_wins = pose_windows(store, n_frames, n_frames // 2)
    val_wins = pose_windows(val_store, n_frames, n_frames // 2,
                            store.pose_mean, store.pose_std)
    lat_train = encode_windows_with_dae(dae, dae_vars, train_wins)
    lat_val = encode_windows_with_dae(dae, dae_vars, val_wins)
    val_frames_lat = lat_val.reshape(-1, rep)
    rng0 = np.random.default_rng(0)
    tr = lat_train.reshape(-1, rep)
    tr = tr[rng0.choice(tr.shape[0], min(20000, tr.shape[0]),
                        replace=False)]
    frame_floor = float(frechet_distance(tr, val_frames_lat))
    print(f"frame-space floor (real train vs real val): "
          f"{frame_floor:.2f}")

    # ---------------- rvq Part b ----------------
    sq_cfg = load_config(dict(
        name="vq_rvq", model="seq2seq", hidden_size=hid, n_layers=2,
        dropout_prob=0.1, epochs=(8 if fast else 80), batch_size=bs_b,
        learning_rate=0.002, rep_learning_dim=rep, n_poses=n_frames,
        n_pre_poses=1, autoencoder_vq=True,
        autoencoder_vq_components=codes, random_seed=0,
        autoencoder_vq_variant="rvq", rvq_stages=args.stages,
        rvq_reestimate_every=(2 if fast else 10),
        model_save_path=os.path.join(args.out, rvq_dir)))
    sq_state, sq_hist = train_seq_ae(
        sq_cfg, lat_train, lat_val,
        save_dir=os.path.join(args.out, rvq_dir), save_every=1000)
    seq = make_seq_ae(sq_cfg)
    seq_vars = {"params": sq_state.params,
                "batch_stats": sq_state.batch_stats}
    print(f"rvq part b: val loss {sq_hist['val_loss'][-1]:.4f}, "
          f"stage-0 perplexity {sq_hist['perplexity'][-1]:.1f}/{codes}")

    # ---------------- multi-stage Part d ----------------
    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store], embedding_dim=100)
    kw = dict(dae_model=dae, dae_variables=dae_vars, seq_model=seq,
              seq_variables=seq_vars, sentence_frame_length=sent_len,
              n_frames=n_frames, fps=fps, max_words=24,
              emit_stage_tokens=True)
    sent = build_sentence_dataset(store, vocab, stride=30, **kw)
    sent_val = build_sentence_dataset(val_store, vocab, stride=sent_len,
                                      mean=store.pose_mean,
                                      std=store.pose_std, **kw)
    t2t_cfg = load_config(dict(
        name="t2t_rvq", model="seq2seq", hidden_size=hid, n_layers=2,
        dropout_prob=0.1, epochs=(10 if fast else 120), batch_size=bs_d,
        learning_rate=0.001, sentence_frame_length=sent_len,
        n_poses=n_frames, n_pre_poses=1, autoencoder_vq=True,
        autoencoder_vq_components=codes, autoencoder_att=True,
        wordembed_dim=100, random_seed=0, token_stages=args.stages,
        model_save_path=os.path.join(args.out, t2t_dir)))
    t2t_state, t2t_hist = train_text2token(
        t2t_cfg, sent, sent_val, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights,
        save_dir=os.path.join(args.out, t2t_dir), save_every=1000)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}
    print(f"rvq part d: val CE {t2t_hist['val_loss'][-1]:.4f}, "
          f"val acc {t2t_hist['val_acc'][-1]:.3f}")

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars,
                                n_poses=n_frames, stride=n_frames)
    bank_val = build_latent_dataset(val_store, dae_model=dae,
                                    dae_variables=dae_vars,
                                    seq_model=seq, seq_variables=seq_vars,
                                    n_poses=n_frames, stride=n_frames,
                                    mean=store.pose_mean,
                                    std=store.pose_std)

    def eval_chain(t2t_m, t2t_v, seq_m, seq_v, chain_bank,
                   chain_bank_val, n_codes, temperature=0.0,
                   soft_decode=0.0):
        g = GestureGenerator(
            t2t_model=t2t_m, t2t_variables=t2t_v, seq_model=seq_m,
            seq_variables=seq_v, dae_model=dae, dae_variables=dae_vars,
            vocab=vocab, pose_mean=store.pose_mean,
            pose_std=store.pose_std, n_frames=n_frames,
            sentence_frame_length=sent_len, fps=fps, max_words=24,
            mode="decode", latent_bank=chain_bank, seed=0,
            temperature=temperature, soft_decode=soft_decode)
        m, frames = eval_generated_vs_gt(
            g, store, val_store, dae, dae_vars, seq_m, seq_v, n_frames,
            n_codes, chain_bank_val, chain_bank, fps)
        m.pop("_hist_gen"), m.pop("_hist_gt")
        m["frame_fgd_shared_dae_space"] = dae_frame_fgd(
            frames, dae, dae_vars, store, val_frames_lat, n_frames)
        return m

    rvq_metrics = eval_chain(t2t, t2t_vars, seq, seq_vars, bank,
                             bank_val, codes)
    # stochastic decode over the same checkpoints: greedy argmax
    # underdisperses the token distribution (the rvq chain's generated
    # perplexity is ~20 vs GT ~48); ancestral sampling at T=1 is the
    # distribution-matching decode policy (models/text2token)
    rvq_sampled = eval_chain(t2t, t2t_vars, seq, seq_vars, bank,
                             bank_val, codes, temperature=1.0)
    # soft-mixture decode (beyond reference): rebuild each chunk's
    # hidden from the Part-d softmax mixture of codebook rows instead
    # of the hard argmax row (infer/text2gesture soft_decode)
    rvq_soft = eval_chain(t2t, t2t_vars, seq, seq_vars, bank,
                          bank_val, codes, soft_decode=1.0)

    # ---------------- committed gssoft chain, same session ------------
    gss_metrics = gss_sampled = gss_soft = None
    vq_ck = sorted(glob.glob(os.path.join(args.out, "vqvae",
                                          "vqvae_checkpoint_*.bin")))
    t2_ck = sorted(glob.glob(os.path.join(args.out, "t2t",
                                          "t2t_checkpoint_*.bin")))
    if vq_ck and t2_ck:
        seq_g, seq_g_vars, _ = checkpoints.load_checkpoint_and_model(
            vq_ck[-1], "autoencoder_vq")
        t2t_g, t2t_g_vars, _ = checkpoints.load_checkpoint_and_model(
            t2_ck[-1], "text2embedding")
        bank_g = build_latent_dataset(store, dae_model=dae,
                                      dae_variables=dae_vars,
                                      seq_model=seq_g,
                                      seq_variables=seq_g_vars,
                                      n_poses=n_frames, stride=n_frames)
        bank_g_val = build_latent_dataset(val_store, dae_model=dae,
                                          dae_variables=dae_vars,
                                          seq_model=seq_g,
                                          seq_variables=seq_g_vars,
                                          n_poses=n_frames,
                                          stride=n_frames,
                                          mean=store.pose_mean,
                                          std=store.pose_std)
        gss_metrics = eval_chain(t2t_g, t2t_g_vars, seq_g, seq_g_vars,
                                 bank_g, bank_g_val,
                                 seq_g.vq_components)
        gss_sampled = eval_chain(t2t_g, t2t_g_vars, seq_g, seq_g_vars,
                                 bank_g, bank_g_val,
                                 seq_g.vq_components, temperature=1.0)
        gss_soft = eval_chain(t2t_g, t2t_g_vars, seq_g, seq_g_vars,
                              bank_g, bank_g_val,
                              seq_g.vq_components, soft_decode=1.0)

    payload = {"frame_floor_shared_dae_space": frame_floor,
               "rvq_multistage_chain": rvq_metrics,
               "rvq_multistage_chain_sampled_t1": rvq_sampled,
               "rvq_multistage_chain_soft_t1": rvq_soft,
               "gssoft_reference_parity_chain": gss_metrics,
               "gssoft_reference_parity_chain_sampled_t1": gss_sampled,
               "gssoft_reference_parity_chain_soft_t1": gss_soft,
               "train": {"part_b_val_loss": sq_hist["val_loss"][-1],
                         "part_b_stage0_perplexity":
                             sq_hist["perplexity"][-1],
                         "part_d_val_ce": t2t_hist["val_loss"][-1],
                         "part_d_val_acc": t2t_hist["val_acc"][-1]}}
    out_path = os.path.join(args.out,
                            f"metrics_rvq_e2e{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out_path)

    def row(name, m):
        if m is None:
            print(f"{name}: (no cached gssoft checkpoints)")
            return
        ratio = m["frechet_seq_latents"] / m["frechet_floor_train_vs_val"]
        print(f"{name}: shared-frame FGD "
              f"{m['frame_fgd_shared_dae_space']:.2f} "
              f"(floor {frame_floor:.2f}), own-space FGD "
              f"{m['frechet_seq_latents']:.1f} = {ratio:.1f}x floor, "
              f"hellinger {m['hellinger']:.3f}, bleu {m['bleu']:.3f}, "
              f"e2e acc {m['token_accuracy']:.3f}")

    row("rvq multi-stage chain", rvq_metrics)
    row("rvq multi-stage chain, sampled T=1", rvq_sampled)
    row("rvq multi-stage chain, soft T=1", rvq_soft)
    row("gssoft reference-parity chain", gss_metrics)
    row("gssoft chain, sampled T=1", gss_sampled)
    row("gssoft chain, soft T=1", gss_soft)


if __name__ == "__main__":
    main()
