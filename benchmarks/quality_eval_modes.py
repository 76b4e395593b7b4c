"""Evaluate BOTH inference modes against held-out ground truth using a
completed quality_run's checkpoints.

QUALITY.md's main table evaluates the decode mode; the reference's
default shipping path is exemplar retrieval
(ref: inference_text2embedding.py:520, 572-624). This script loads the
trained a/b/d checkpoints from a quality_run output dir and runs the
same generated-vs-ground-truth metric battery for decode AND exemplar,
writing metrics_modes.json next to them.

    python benchmarks/quality_eval_modes.py /tmp/quality_out \
        [--platform cpu]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from quality_run import eval_generated_vs_gt  # noqa: E402


def _latest(pattern):
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    return paths[-1]


def boundary_jump(frames_list, n_frames_chunk):
    """Mean pose jump across chunk boundaries (generated frames,
    unnormalized space): the splice-discontinuity metric that the
    exemplar mode's random retrieval pays and continuity-aware
    retrieval (motion matching) minimizes. Compare against the real
    corpus' consecutive-frame delta (the floor)."""
    js = []
    for f in frames_list:
        f = np.asarray(f)
        ks = np.arange(n_frames_chunk, f.shape[0], n_frames_chunk)
        if len(ks):
            js.append(np.linalg.norm(f[ks] - f[ks - 1], axis=1))
    return float(np.mean(np.concatenate(js))) if js else float("nan")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train import checkpoints

    print("backend:", jax.devices()[0].platform)
    store = ClipStore(os.path.join(args.out, "corpus/store/train"))
    val_store = ClipStore(os.path.join(args.out, "corpus/store/val"))

    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        _latest(os.path.join(args.out, "dae/*.bin")), "DAE")
    seq, seq_vars, seq_payload = checkpoints.load_checkpoint_and_model(
        _latest(os.path.join(args.out, "vqvae/*.bin")), "autoencoder_vq")
    t2t, t2t_vars, t2t_payload = checkpoints.load_checkpoint_and_model(
        _latest(os.path.join(args.out, "t2t/*.bin")), "text2embedding")
    cfg = seq_payload["config"]
    t2t_cfg = t2t_payload["config"]
    codes = cfg.autoencoder_vq_components
    n_frames_chunk, fps = cfg.n_poses, 20

    # vocab: same deterministic rebuild as quality_run (word insertion
    # order from the train store), must match the trained embedding
    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store],
                        embedding_dim=t2t_cfg.wordembed_dim)
    assert vocab.n_words == t2t.n_words, \
        f"vocab drift: {vocab.n_words} vs trained {t2t.n_words}"

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars,
                                n_poses=n_frames_chunk,
                                stride=n_frames_chunk)
    bank_val = build_latent_dataset(val_store, dae_model=dae,
                                    dae_variables=dae_vars,
                                    seq_model=seq, seq_variables=seq_vars,
                                    n_poses=n_frames_chunk,
                                    stride=n_frames_chunk,
                                    mean=store.pose_mean,
                                    std=store.pose_std)

    # real-motion floor for the boundary-jump metric: consecutive-frame
    # deltas inside the held-out clips (unnormalized pose space)
    real_deltas = []
    for clip in val_store:
        p = np.asarray(clip["poses"], np.float32)
        real_deltas.append(np.linalg.norm(np.diff(p, axis=0), axis=1))
    real_frame_delta = float(np.mean(np.concatenate(real_deltas)))

    results = {"real_consecutive_frame_delta": real_frame_delta}
    for label, mode, extra in (
            ("decode", "decode", {}),
            ("decode_continuity", "decode", {"chunk_continuity": True}),
            ("decode_smoothed", "decode", {"_smooth": True}),
            # stochastic decode (beyond reference): greedy argmax
            # underdisperses the generated token distribution
            # (QUALITY.md: generated ppl 4.7 vs real 6.9); ancestral
            # sampling at T<=1 restores diversity
            ("decode_sample_t0.7", "decode", {"temperature": 0.7}),
            ("decode_sample_t1.0", "decode", {"temperature": 1.0}),
            ("decode_beam4", "decode", {"beam_width": 4}),
            # soft-mixture decode (beyond reference): the GS-Soft
            # decoder trains on SOFT codebook mixtures, so the hard
            # codebook[argmax] vertex is out of distribution by design
            # (QUALITY.md VQ ablation); feed the Part-d-probability-
            # weighted mixture instead
            ("decode_soft_t0.5", "decode", {"soft_decode": 0.5}),
            ("decode_soft_t1.0", "decode", {"soft_decode": 1.0}),
            ("decode_soft_sample_t1.0", "decode",
             {"soft_decode": 1.0, "temperature": 1.0}),
            # overlap-blended chunk decode (reference-style blending
            # applied to the token decode): kills the seam jump locally
            ("decode_overlap4", "decode", {"decode_overlap": 4}),
            ("exemplar_sample_t1.0", "exemplar", {"temperature": 1.0}),
            ("exemplar", "exemplar", {}),
            # continuity-aware retrieval (motion matching, beyond
            # reference): minimizes the splice jump at chunk boundaries
            ("exemplar_continuity", "exemplar",
             {"exemplar_continuity": True}),
            ("exemplar_continuity_sample_t1.0", "exemplar",
             {"exemplar_continuity": True, "temperature": 1.0}),
            ("exemplar_smoothed", "exemplar", {"_smooth": True})):
        smooth = bool(extra.pop("_smooth", False))
        gen = GestureGenerator(
            t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
            seq_variables=seq_vars, dae_model=dae,
            dae_variables=dae_vars, vocab=vocab,
            pose_mean=store.pose_mean, pose_std=store.pose_std,
            n_frames=n_frames_chunk,
            sentence_frame_length=t2t_cfg.sentence_frame_length,
            fps=fps, max_words=24, mode=mode, latent_bank=bank, seed=0,
            **extra)
        m, gen_frames = eval_generated_vs_gt(
            gen, store, val_store, dae, dae_vars, seq, seq_vars,
            n_frames_chunk, codes, bank_val, bank, fps,
            smooth_generated=smooth)
        m.pop("_hist_gen")
        m.pop("_hist_gt")
        m["boundary_jump"] = boundary_jump(gen_frames, n_frames_chunk)
        results[label] = m
        print(f"\n=== {label} ===")
        print(json.dumps(m, indent=2))

    with open(os.path.join(args.out, "metrics_modes.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("\nwrote", os.path.join(args.out, "metrics_modes.json"))


if __name__ == "__main__":
    main()
