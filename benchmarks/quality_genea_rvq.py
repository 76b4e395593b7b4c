"""RVQ multi-stage recipe on the GENEA/TWH dataset family (round 4).

The TWH chain's committed numbers are gssoft-only (metrics_genea.json:
FGD 248 greedy -> 156 soft decode); the repo's best generated-motion
recipe — 4-stage residual VQ + multi-stage Part d + sampled T=1
(docs/quality/metrics_rvq_e2e_s4.json, 10.21 shared-frame on the
Trinity motif corpus) — was never measured on the second family. This
harness trains that recipe on the SAME cached TWH corpus + frozen
Part-a DAE as quality_genea.py and MERGES an `rvq_multistage` block
into metrics_genea.json, with:

  - the chain-internal battery + own-space x-floor ratio (own-space
    FGDs are not comparable across chains; the ratio is),
  - a shared frozen-DAE frame-space FGD directly comparable to a
    re-evaluated gssoft chain in the same session.

Run AFTER benchmarks/quality_genea.py (shares corpus + dae + vqvae/t2t
checkpoints):
    python benchmarks/quality_genea_rvq.py /tmp/quality_genea
    python benchmarks/quality_genea_rvq.py /tmp/qg_fast --fast \
        --platform cpu

Reference context: the TWH variant is scripts/twh_dataset_to_lmdb.py:
120-148 + config/VQ-VAE_GENEA.yml; the reference has no residual
stages (single GS-Soft VQ, scripts/model/DAE_model.py VQ zoo).
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from quality_run import eval_generated_vs_gt  # noqa: E402
from quality_rvq_e2e import dae_frame_fgd  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_genea")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--arch", default="gru",
                    choices=["gru", "transformer"])
    ap.add_argument("--label-smoothing", type=float, default=0.0,
                    help="round-5 distribution lever on the Part d "
                         "(the measured-best generated-motion lever on "
                         "both Trinity corpora); a non-zero value gets "
                         "its own checkpoint dir and a _ls result key")
    ap.add_argument("--retrain", action="store_true")
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
    S = args.stages
    # GENEA production shapes (configs/VQ-VAE_GENEA.yml)
    fps, n_chunk, sent_len, rep = 10, 10, 60, 40
    codes = 32 if fast else 64
    hid = 64 if fast else 200
    bs_b = 32 if fast else 128
    bs_d = 4 if fast else 32
    max_words = 16

    store = ClipStore(os.path.join(args.out, "corpus", "store", "train"))
    val_store = ClipStore(os.path.join(args.out, "corpus", "store",
                                       "val"))
    dae_ckpts = sorted(glob.glob(os.path.join(args.out, "dae", "*.bin")))
    assert dae_ckpts, "run benchmarks/quality_genea.py first"
    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        dae_ckpts[-1], "DAE")

    # shared frozen-DAE frame space
    train_wins = pose_windows(store, n_chunk, n_chunk // 2)
    val_wins = pose_windows(val_store, n_chunk, n_chunk // 2,
                            store.pose_mean, store.pose_std)
    lat_train = encode_windows_with_dae(dae, dae_vars, train_wins)
    lat_val = encode_windows_with_dae(dae, dae_vars, val_wins)
    val_frames_lat = lat_val.reshape(-1, rep)
    tr = lat_train.reshape(-1, rep)
    tr = tr[np.random.default_rng(0).choice(
        tr.shape[0], min(20000, tr.shape[0]), replace=False)]
    frame_floor = float(frechet_distance(tr, val_frames_lat))
    print(f"shared frame-space floor: {frame_floor:.2f}")

    # ---------------- rvq Part b ----------------
    b_dir = os.path.join(args.out, f"rvq_vq_s{S}")
    sq_cfg = load_config(dict(
        name="rvq_genea", model="seq2seq", hidden_size=hid, n_layers=2,
        dropout_prob=0.1, epochs=(8 if fast else 80), batch_size=bs_b,
        learning_rate=0.002, rep_learning_dim=rep, n_poses=n_chunk,
        n_pre_poses=1, autoencoder_vq=True,
        autoencoder_vq_components=codes, random_seed=0,
        autoencoder_vq_variant="rvq", rvq_stages=S,
        rvq_reestimate_every=(2 if fast else 10),
        model_save_path=b_dir))
    b_ck = sorted(glob.glob(os.path.join(b_dir, "*.bin")))
    train_info = {}
    if b_ck and not args.retrain:
        seq, seq_vars, _ = checkpoints.load_checkpoint_and_model(
            b_ck[-1], "autoencoder_vq")
        print(f"rvq part b: reused {b_ck[-1]}")
    else:
        sq_state, sq_hist = train_seq_ae(sq_cfg, lat_train, lat_val,
                                         save_dir=b_dir, save_every=1000)
        seq = make_seq_ae(sq_cfg)
        seq_vars = {"params": sq_state.params,
                    "batch_stats": sq_state.batch_stats}
        train_info["part_b_val_loss"] = sq_hist["val_loss"][-1]
        train_info["part_b_stage0_perplexity"] = sq_hist["perplexity"][-1]
        print(f"rvq part b: val loss {sq_hist['val_loss'][-1]:.4f}, "
              f"stage-0 perplexity "
              f"{sq_hist['perplexity'][-1]:.1f}/{codes}")

    # ---------------- stage-conditional multi-stage Part d -----------
    vocab = build_vocab("quality_genea",
                        [[w[0] for w in c["words"]] for c in store],
                        embedding_dim=100)
    kw = dict(dae_model=dae, dae_variables=dae_vars, seq_model=seq,
              seq_variables=seq_vars, sentence_frame_length=sent_len,
              n_frames=n_chunk, fps=fps, max_words=max_words,
              emit_stage_tokens=True)
    sent = build_sentence_dataset(store, vocab, stride=15, **kw)
    sent_val = build_sentence_dataset(val_store, vocab, stride=sent_len,
                                      mean=store.pose_mean,
                                      std=store.pose_std, **kw)
    ls_tag = "_ls" if args.label_smoothing else ""
    d_dir = os.path.join(args.out, f"rvq_t2t_s{S}_{args.arch}{ls_tag}")
    t2t_cfg = load_config(dict(
        name="rvq_t2t_genea", model="seq2seq", hidden_size=hid,
        n_layers=2, dropout_prob=0.1, epochs=(10 if fast else 120),
        batch_size=bs_d, learning_rate=0.001,
        sentence_frame_length=sent_len, n_poses=n_chunk, n_pre_poses=1,
        autoencoder_vq=True, autoencoder_vq_components=codes,
        autoencoder_att=True, wordembed_dim=100, random_seed=0,
        token_stages=S, stage_conditional=True, model_save_path=d_dir,
        label_smoothing=args.label_smoothing,
        extras=({"t2t_arch": args.arch}
                if args.arch != "gru" else {})))
    d_ck = sorted(glob.glob(os.path.join(d_dir, "*.bin")))
    if d_ck and not args.retrain:
        t2t, t2t_vars, _ = checkpoints.load_checkpoint_and_model(
            d_ck[-1], "text2embedding")
        print(f"rvq part d: reused {d_ck[-1]}")
    else:
        t0 = time.perf_counter()
        t2t_state, t2t_hist = train_text2token(
            t2t_cfg, sent, sent_val, vocab.n_words,
            embedding_weights=vocab.word_embedding_weights,
            save_dir=d_dir, save_every=1000)
        t2t = make_text2token(t2t_cfg, vocab.n_words)
        t2t_vars = {"params": t2t_state.params,
                    "batch_stats": t2t_state.batch_stats}
        train_info.update({
            "part_d_wall_s": time.perf_counter() - t0,
            "part_d_val_ce": t2t_hist["val_loss"][-1],
            "part_d_val_acc": t2t_hist["val_acc"][-1]})
        print(f"rvq part d: val CE {t2t_hist['val_loss'][-1]:.4f}, "
              f"val acc {t2t_hist['val_acc'][-1]:.3f}")

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars, n_poses=n_chunk,
                                stride=n_chunk)
    bank_val = build_latent_dataset(
        val_store, dae_model=dae, dae_variables=dae_vars, seq_model=seq,
        seq_variables=seq_vars, n_poses=n_chunk, stride=n_chunk,
        mean=store.pose_mean, std=store.pose_std)

    def eval_chain(t2t_m, t2t_v, seq_m, seq_v, c_bank, c_bank_val,
                   n_codes, **extra):
        extra = dict(extra)
        gen_mode = extra.pop("mode", "decode")
        g = GestureGenerator(
            t2t_model=t2t_m, t2t_variables=t2t_v, seq_model=seq_m,
            seq_variables=seq_v, dae_model=dae, dae_variables=dae_vars,
            vocab=vocab, pose_mean=store.pose_mean,
            pose_std=store.pose_std, n_frames=n_chunk,
            sentence_frame_length=sent_len, fps=fps,
            max_words=max_words, mode=gen_mode, latent_bank=c_bank,
            seed=0, **extra)
        m, frames = eval_generated_vs_gt(
            g, store, val_store, dae, dae_vars, seq_m, seq_v, n_chunk,
            n_codes, c_bank_val, c_bank, fps)
        m.pop("_hist_gen"), m.pop("_hist_gt")
        m["own_space_x_floor"] = (m["frechet_seq_latents"]
                                  / m["frechet_floor_train_vs_val"])
        m["frame_fgd_shared_dae_space"] = dae_frame_fgd(
            frames, dae, dae_vars, store, val_frames_lat, n_chunk)
        return m

    block = {"stages": S, "arch": args.arch,
             "label_smoothing": args.label_smoothing,
             "train": train_info}
    for label, extra in (("greedy", {}),
                         ("sampled_t1", {"temperature": 1.0}),
                         ("soft_t1", {"soft_decode": 1.0}),
                         # round-5 production modes (QUALITY.md): the
                         # winning decode policy (sampled primary +
                         # greedy residuals) and the retrieval modes
                         # that land near the floor on both Trinity
                         # corpora
                         ("s0sampled_t1",
                          {"temperature": 0.0,
                           "stage0_temperature": 1.0}),
                         ("exemplar_sampled_t1",
                          {"mode": "exemplar", "temperature": 1.0}),
                         ("exemplar_cont_sampled_t1",
                          {"mode": "exemplar", "temperature": 1.0,
                           "exemplar_continuity": True})):
        block[label] = eval_chain(t2t, t2t_vars, seq, seq_vars, bank,
                                  bank_val, codes, **extra)
        print(f"rvq {label}: shared-frame FGD "
              f"{block[label]['frame_fgd_shared_dae_space']:.2f}, "
              f"own-space {block[label]['frechet_seq_latents']:.1f} = "
              f"{block[label]['own_space_x_floor']:.1f}x floor")

    # re-evaluate the committed gssoft chain in the SAME session/space
    gss_shared = None
    vq_ck = sorted(glob.glob(os.path.join(args.out, "vqvae", "*.bin")))
    t2_ck = sorted(glob.glob(os.path.join(args.out, "t2t", "*.bin")))
    if vq_ck and t2_ck:
        seq_g, seq_g_vars, _ = checkpoints.load_checkpoint_and_model(
            vq_ck[-1], "autoencoder_vq")
        t2t_g, t2t_g_vars, _ = checkpoints.load_checkpoint_and_model(
            t2_ck[-1], "text2embedding")
        bank_g = build_latent_dataset(
            store, dae_model=dae, dae_variables=dae_vars, seq_model=seq_g,
            seq_variables=seq_g_vars, n_poses=n_chunk, stride=n_chunk)
        bank_g_val = build_latent_dataset(
            val_store, dae_model=dae, dae_variables=dae_vars,
            seq_model=seq_g, seq_variables=seq_g_vars, n_poses=n_chunk,
            stride=n_chunk, mean=store.pose_mean, std=store.pose_std)
        gss_shared = {}
        for label, extra in (("greedy", {}),
                             ("soft_t1", {"soft_decode": 1.0})):
            gss_shared[label] = eval_chain(
                t2t_g, t2t_g_vars, seq_g, seq_g_vars, bank_g,
                bank_g_val, seq_g.vq_components, **extra)
            print(f"gssoft {label}: shared-frame FGD "
                  f"{gss_shared[label]['frame_fgd_shared_dae_space']:.2f}"
                  f", own-space "
                  f"{gss_shared[label]['frechet_seq_latents']:.1f} = "
                  f"{gss_shared[label]['own_space_x_floor']:.1f}x floor")

    # merge into metrics_genea.json
    path = os.path.join(args.out, "metrics_genea.json")
    metrics = json.load(open(path)) if os.path.exists(path) else {}
    metrics["frame_floor_shared_dae_space"] = frame_floor
    key = ("rvq_multistage" if args.arch == "gru"
           else f"rvq_multistage_{args.arch}") + ls_tag
    metrics[key] = block
    if gss_shared is not None:
        metrics["gssoft_shared_space_reeval"] = gss_shared
    with open(path, "w") as f:
        json.dump(metrics, f, indent=1)
    print("merged rvq block into", path)


if __name__ == "__main__":
    main()
