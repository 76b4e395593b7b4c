"""Combined-lever study: close the Part-d prediction gap (round-4).

The 4-stage residual-VQ chain's perfect-token ceiling is shared-frame
FGD 1.48, but predicted tokens landed at 10.2 (sampled T=1,
docs/quality/metrics_rvq_e2e_s4.json) — Part-d prediction error
dominates generated-motion quality. Round 3 measured each lever in
isolation; this harness combines them in ONE session against the same
frozen Part-a DAE + one shared 4-stage rvq Part b:

  gru_indep    token_stages=S, independent summed-CE heads
               (the committed rvq_e2e_s4 config — in-session baseline)
  gru_cond     + stage_conditional heads (head s sees stages < s,
               models/text2token.stage_chain)
  tf_cond      + t2t_arch: transformer (models/transformer)
  tf_cond_ctx  + text_context_s=6 (cross-window word context at both
               dataset build and inference)

Each variant decodes greedy / sampled T=1 / soft-mixture T=1, every
row scored in the SHARED frozen-DAE frame space (CLAUDE.md round-3
lesson: own-space FGDs are not comparable across chains) next to the
chain-internal reference battery. Success bar from VERDICT.md item 2:
best shared-frame FGD <= 6 (halve 10.2) or a measured explanation.

Run AFTER benchmarks/quality_run.py (shares its corpus + DAE):
    python benchmarks/quality_combined.py /tmp/quality_out
    python benchmarks/quality_combined.py /tmp/qfast --fast  # smoke
Writes <out>/metrics_combined.json. Re-runs reuse any variant whose
checkpoint dir already exists (--retrain forces).

Reference context: the decode loop being out-predicted is
scripts/model/text2embedding_model.py:701-744; the reference has no
residual stages, no transformer Part d, and window-local words only
(scripts/data_loader/data_preprocessor.py get_words_in_time_range).
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
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--context", type=float, default=6.0)
    ap.add_argument("--retrain", action="store_true",
                    help="ignore existing variant checkpoints")
    ap.add_argument("--variants", default=None,
                    help="comma list to restrict (default: all four)")
    ap.add_argument("--temps", default=None,
                    help="comma list of extra sampled-decode temperatures "
                         "to evaluate per variant (reuses checkpoints; "
                         "writes metrics_combined_sweep.json)")
    ap.add_argument("--s0-temps", default=None,
                    help="comma list of PRIMARY-token temperatures for "
                         "the round-5 winning policy (sampled stage 0, "
                         "greedy residuals; reuses checkpoints; writes "
                         "metrics_combined_s0sweep.json)")
    ap.add_argument("--modes", default=None,
                    help="comma list to restrict decode modes "
                         "(greedy,sampled_t1,soft_t1)")
    ap.add_argument("--exemplar", action="store_true",
                    help="evaluate the exemplar-retrieval modes instead "
                         "of the decode modes (reuses checkpoints; "
                         "writes metrics_combined_exemplar.json)")
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
    n_frames, rep, fps, sent_len = 20, 40, 20, 120
    hid = 64 if fast else 200
    codes = 32 if fast else 64
    bs_b = 32 if fast else 128
    bs_d = 4 if fast else 32
    max_words = 40  # context variant needs the wider pad; shared so
    # every variant sees byte-identical word tensors where possible

    store = ClipStore(os.path.join(args.out, "corpus", "store", "train"))
    val_store = ClipStore(os.path.join(args.out, "corpus", "store",
                                       "val"))
    dae_ckpts = sorted(glob.glob(os.path.join(args.out, "dae", "*.bin")))
    assert dae_ckpts, "run benchmarks/quality_run.py first"
    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        dae_ckpts[-1], "DAE")

    # shared frozen-DAE frame space: floor + real val frames
    train_wins = pose_windows(store, n_frames, n_frames // 2)
    val_wins = pose_windows(val_store, n_frames, n_frames // 2,
                            store.pose_mean, store.pose_std)
    lat_train = encode_windows_with_dae(dae, dae_vars, train_wins)
    lat_val = encode_windows_with_dae(dae, dae_vars, val_wins)
    val_frames_lat = lat_val.reshape(-1, rep)
    tr = lat_train.reshape(-1, rep)
    tr = tr[np.random.default_rng(0).choice(
        tr.shape[0], min(20000, tr.shape[0]), replace=False)]
    frame_floor = float(frechet_distance(tr, val_frames_lat))
    print(f"shared frame-space floor: {frame_floor:.2f}")

    # ---------------- shared rvq Part b (S stages) ----------------
    b_dir = os.path.join(args.out, f"cmb_vq_s{S}")
    sq_cfg = load_config(dict(
        name="cmb_vq", model="seq2seq", hidden_size=hid, n_layers=2,
        dropout_prob=0.1, epochs=(8 if fast else 80), batch_size=bs_b,
        learning_rate=0.002, rep_learning_dim=rep, n_poses=n_frames,
        n_pre_poses=1, autoencoder_vq=True,
        autoencoder_vq_components=codes, random_seed=0,
        autoencoder_vq_variant="rvq", rvq_stages=S,
        rvq_reestimate_every=(2 if fast else 10),
        model_save_path=b_dir))
    b_ck = sorted(glob.glob(os.path.join(b_dir, "*.bin")))
    if b_ck and not args.retrain:
        seq, seq_vars, _ = checkpoints.load_checkpoint_and_model(
            b_ck[-1], "autoencoder_vq")
        print(f"part b: reused {b_ck[-1]}")
    else:
        sq_state, sq_hist = train_seq_ae(sq_cfg, lat_train, lat_val,
                                         save_dir=b_dir, save_every=1000)
        seq = make_seq_ae(sq_cfg)
        seq_vars = {"params": sq_state.params,
                    "batch_stats": sq_state.batch_stats}
        print(f"part b: val loss {sq_hist['val_loss'][-1]:.4f}, stage-0 "
              f"perplexity {sq_hist['perplexity'][-1]:.1f}/{codes}")

    # ---------------- sentence datasets ----------------
    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store], embedding_dim=100)
    kw = dict(dae_model=dae, dae_variables=dae_vars, seq_model=seq,
              seq_variables=seq_vars, sentence_frame_length=sent_len,
              n_frames=n_frames, fps=fps, max_words=max_words,
              emit_stage_tokens=True)
    sent0 = build_sentence_dataset(store, vocab, stride=30, **kw)
    sent0_val = build_sentence_dataset(val_store, vocab, stride=sent_len,
                                       mean=store.pose_mean,
                                       std=store.pose_std, **kw)
    sent_c = build_sentence_dataset(store, vocab, stride=30,
                                    text_context_s=args.context, **kw)
    sent_c_val = build_sentence_dataset(val_store, vocab,
                                        stride=sent_len,
                                        mean=store.pose_mean,
                                        std=store.pose_std,
                                        text_context_s=args.context, **kw)

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

    VARIANTS = {
        # name: (arch, stage_conditional, context_s, cfg_extra)
        "gru_indep": ("gru", False, 0.0, {}),
        "gru_cond": ("gru", True, 0.0, {}),
        "tf_cond": ("transformer", True, 0.0, {}),
        "tf_cond_ctx": ("transformer", True, args.context, {}),
        # round-4 continuation: model-side levers on the tf_cond winner.
        # The temperature sweep showed the residual gap is the model's
        # DISTRIBUTION, not decode policy — these attack the
        # distribution at train time. tf_cond_best: Part d overfits
        # from ~epoch 40 (QUALITY.md), yet every variant above
        # evaluates the final epoch-120 state; keep_best evaluates the
        # best-val-CE snapshot instead. tf_cond_ls: label smoothing
        # 0.1 regularizes the predictive distribution the sampled
        # decode draws from.
        "tf_cond_best": ("transformer", True, 0.0, {"keep_best": True}),
        "tf_cond_ls": ("transformer", True, 0.0,
                       {"label_smoothing": 0.1}),
        # round-5: the two levers combined (VERDICT r4 item 1)
        "tf_cond_best_ls": ("transformer", True, 0.0,
                            {"keep_best": True, "label_smoothing": 0.1}),
        # round-5 (VERDICT r4 item 3): feedback-matched finetune — the
        # last 30 (of 120) epochs train on the model's own decode
        # rollout (train/text2token_trainer.make_feedback_train_step)
        # instead of the teacher-forced parallel pass. _ff = argmax
        # feedback (the reference's train-time semantics,
        # text2embedding_model.py:734-744); _ff_s = sampled feedback
        # T=1 (matches the sampled eval decode policy exactly).
        "tf_cond_ff": ("transformer", True, 0.0,
                       {"feedback_finetune_epochs": 30}),
        "tf_cond_ff_s": ("transformer", True, 0.0,
                         {"feedback_finetune_epochs": 30,
                          "feedback_temperature": 1.0}),
        # round-5 capacity probe (VERDICT r4 item 8): is the residual
        # distribution gap capacity-bound? 2x hidden on the Part d
        # ONLY (shared Part b unchanged), same schedule. The
        # transformer's own docstring predicts its MFU inverts vs the
        # GRU past H>=1024; H=400 probes quality, not wall-clock.
        "tf_cond_h400": ("transformer", True, 0.0,
                         {"hidden_size": 400}),
    }
    if args.variants:
        keep = set(args.variants.split(","))
        VARIANTS = {k: v for k, v in VARIANTS.items() if k in keep}

    results = {"frame_floor_shared_dae_space": frame_floor,
               "stages": S, "context_s": args.context,
               "schedule": {"hidden": hid, "codes": codes,
                            "epochs_d": (10 if fast else 120)},
               "variants": {}}

    for name, (arch, cond, ctx, xcfg) in VARIANTS.items():
        d_dir = os.path.join(args.out, f"cmb_{name}")
        ckw = dict(
            name=f"cmb_{name}", model="seq2seq", hidden_size=hid,
            n_layers=2, dropout_prob=0.1, epochs=(10 if fast else 120),
            batch_size=bs_d, learning_rate=0.001,
            sentence_frame_length=sent_len, n_poses=n_frames,
            n_pre_poses=1, autoencoder_vq=True,
            autoencoder_vq_components=codes, autoencoder_att=True,
            wordembed_dim=100, random_seed=0, token_stages=S,
            stage_conditional=cond, text_context_s=ctx,
            model_save_path=d_dir,
            extras=({"t2t_arch": arch} if arch != "gru" else {}))
        # update (not **) so a variant can OVERRIDE base keys too
        # (tf_cond_h400 overrides hidden_size — Part d only; the shared
        # Part b stays at `hid`)
        ckw.update(xcfg)
        t2t_cfg = load_config(ckw)
        sent = sent_c if ctx else sent0
        sent_val = sent_c_val if ctx else sent0_val
        # latest_checkpoint prefers the keep_best snapshot over the
        # final numbered epoch (round-4 advisor: sorted(glob)[-1]
        # silently evaluated the overfit epoch-120 state for
        # keep_best variants on reuse)
        d_ck = checkpoints.latest_checkpoint(d_dir)
        var_res = {"arch": arch, "stage_conditional": cond,
                   "context_s": ctx, **xcfg}
        if d_ck and not args.retrain:
            t2t, t2t_vars, pl = checkpoints.load_checkpoint_and_model(
                d_ck, "text2embedding")
            var_res["train"] = {"reused_checkpoint": os.path.basename(
                d_ck)}
            print(f"\n### {name}: reused {d_ck}")
        else:
            t0 = time.perf_counter()
            t2t_state, t2t_hist = train_text2token(
                t2t_cfg, sent, sent_val, vocab.n_words,
                embedding_weights=vocab.word_embedding_weights,
                save_dir=d_dir, save_every=1000)
            t2t = make_text2token(t2t_cfg, vocab.n_words)
            t2t_vars = {"params": t2t_state.params,
                        "batch_stats": t2t_state.batch_stats}
            var_res["train"] = {
                "wall_s": time.perf_counter() - t0,
                "val_ce_last": t2t_hist["val_loss"][-1],
                "val_ce_best": float(np.min(t2t_hist["val_loss"])),
                "val_acc_last": t2t_hist["val_acc"][-1],
                "val_acc_best": float(np.max(t2t_hist["val_acc"]))}
            print(f"\n### {name}: val CE {t2t_hist['val_loss'][-1]:.3f} "
                  f"acc {t2t_hist['val_acc'][-1]:.3f}")

        modes = [("greedy", {}),
                 ("sampled_t1", {"temperature": 1.0}),
                 ("soft_t1", {"soft_decode": 1.0}),
                 # round-5 per-stage policy (VERDICT r4 item 3): greedy
                 # PRIMARY (semantic token choice — sampling it costs
                 # BLEU 0.350 -> 0.099, QUALITY.md) + sampled residual
                 # stages (the distributional dispersion that fixes the
                 # sampled-decode FGD). Single-stage variants collapse
                 # to greedy; skip for them.
                 ("s0greedy_t1", {"temperature": 1.0,
                                  "stage0_temperature": 0.0}),
                 # ... and the complement: sampled PRIMARY + greedy
                 # residual stages. First std measurements show
                 # s0greedy_t1 == greedy on FGD/hellinger — the
                 # distributional dispersion that wins FGD comes from
                 # sampling the primary, not the residuals; this mode
                 # tests whether residual sampling contributes ANYTHING
                 # beyond primary sampling (== sampled_t1 would mean no)
                 ("s0sampled_t1", {"temperature": 0.0,
                                   "stage0_temperature": 1.0})]
        if S <= 1:
            modes = [m for m in modes
                     if m[0] not in ("s0greedy_t1", "s0sampled_t1")]
        if args.temps:
            modes = [(f"sampled_t{t}", {"temperature": float(t)})
                     for t in args.temps.split(",")]
        if args.s0_temps:
            # round-5 follow-up: the winning decode samples ONLY the
            # primary token (s0sampled_t1 = 2.59); sweep that
            # temperature to check T=1 is not a local accident (the
            # round-4 all-stage sweep was flat, but that was pre-ls)
            modes = [(f"s0sampled_t{t}",
                      {"temperature": 0.0, "stage0_temperature": float(t)})
                     for t in args.s0_temps.split(",")]
        if args.exemplar:
            modes = [("exemplar", {"mode": "exemplar"}),
                     ("exemplar_continuity",
                      {"mode": "exemplar", "exemplar_continuity": True}),
                     ("exemplar_sampled_t1",
                      {"mode": "exemplar", "temperature": 1.0}),
                     # round-5: the two strongest exemplar levers
                     # combined — sampled tokens (the FGD driver) +
                     # continuity-aware retrieval (the boundary-jump
                     # fixer, QUALITY.md splice rows)
                     ("exemplar_cont_sampled_t1",
                      {"mode": "exemplar", "temperature": 1.0,
                       "exemplar_continuity": True})]
        if args.modes:  # applied LAST so it filters whatever set
            # --temps/--exemplar built; unknown names are an error, not
            # a silent zero-mode run (round-4 advisor finding)
            known = {m[0] for m in modes}
            keep_modes = set(args.modes.split(","))
            bad = keep_modes - known
            if bad:
                raise SystemExit(f"--modes: unknown mode(s) "
                                 f"{sorted(bad)}; known: {sorted(known)}")
            modes = [m for m in modes if m[0] in keep_modes]
        for label, extra in modes:
            extra = dict(extra)
            gen_mode = extra.pop("mode", "decode")
            gen = GestureGenerator(
                t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
                seq_variables=seq_vars, dae_model=dae,
                dae_variables=dae_vars, vocab=vocab,
                pose_mean=store.pose_mean, pose_std=store.pose_std,
                n_frames=n_frames, sentence_frame_length=sent_len,
                fps=fps, max_words=max_words, mode=gen_mode,
                latent_bank=bank, seed=0, text_context_s=ctx, **extra)
            m, frames = eval_generated_vs_gt(
                gen, store, val_store, dae, dae_vars, seq, seq_vars,
                n_frames, codes, bank_val, bank, fps)
            m.pop("_hist_gen"), m.pop("_hist_gt")
            m["frame_fgd_shared_dae_space"] = dae_frame_fgd(
                frames, dae, dae_vars, store, val_frames_lat, n_frames)
            var_res[label] = m
            print(f"  {label}: shared-frame FGD "
                  f"{m['frame_fgd_shared_dae_space']:.2f}, e2e acc "
                  f"{m['token_accuracy']:.3f}, hellinger "
                  f"{m['hellinger']:.3f}")
        results["variants"][name] = var_res

    out_name = "metrics_combined.json"
    if args.temps:
        out_name = "metrics_combined_sweep.json"
    if args.s0_temps:
        out_name = "metrics_combined_s0sweep.json"
    if args.exemplar:
        out_name = "metrics_combined_exemplar.json"
    if args.modes:
        # a --modes-restricted run must not clobber a full run's
        # canonical results (round-4 advisor finding)
        out_name = out_name.replace(".json", "_modes.json")
    if args.variants:
        # same hazard for --variants: a restricted (re)train run would
        # overwrite the canonical all-variant JSON with a partial one
        out_name = out_name.replace(".json", "_partial.json")
    out_path = os.path.join(args.out, out_name)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("\nwrote", out_path)

    rows = []
    for name, vr in results["variants"].items():
        for label, m in vr.items():
            if isinstance(m, dict) and "frame_fgd_shared_dae_space" in m:
                rows.append((m["frame_fgd_shared_dae_space"],
                             name, label))
    rows.sort()
    print(f"\nranking (shared-frame FGD, floor {frame_floor:.2f}, "
          f"round-3 best 10.21, target <= 6):")
    for fgd, name, label in rows:
        print(f"  {fgd:8.2f}  {name} / {label}")


if __name__ == "__main__":
    main()
