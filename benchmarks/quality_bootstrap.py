"""Build just the shared prerequisites of the quality studies:
the motif corpus + the frozen Part-a DAE teacher.

benchmarks/quality_combined.py, quality_rvq_e2e.py, quality_vq_ablation
etc. only need `<out>/corpus/store/{train,val}` and `<out>/dae/*.bin`
from quality_run.py — on a fresh container this script provides them in
~1/4 of a full quality_run (which also trains Parts b and d that the
downstream studies retrain anyway).

    python benchmarks/quality_bootstrap.py /tmp/quality_out [--hard]

Sizes match quality_run.py exactly (same corpus guard constants), so a
later full quality_run on the same out dir reuses the cached corpus.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from quality_run import make_motif_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from gesture2vec_tpu.data.datasets import all_frames
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import train_dae

    logging.basicConfig(level=logging.INFO)
    print("backend:", jax.devices()[0].platform)

    fast = args.fast
    n_files = (4 if fast else 12) * (2 if args.hard else 1)
    duration_s = 30.0 if fast else 120.0
    fps, rep = 20, 40

    corpus = os.path.join(args.out, "corpus")
    if not os.path.exists(os.path.join(corpus, "store", "train",
                                       "meta.msgpack")):
        make_motif_corpus(corpus, n_files=n_files, duration_s=duration_s,
                          hard=args.hard)
        ingest_trinity(corpus, tgt_fps=fps, with_audio=False)
    store = ClipStore(os.path.join(corpus, "store", "train"))
    val_store = ClipStore(os.path.join(corpus, "store", "val"))
    # same fail-fast size guard as quality_run.py: a stale corpus from
    # a different --fast/--hard run must not be silently reused
    # (round-4 advisor finding; mirror augmentation doubles clips,
    # first file + its mirror are held out)
    if (len(store) != 2 * (n_files - 1)
            or abs(store[0]["poses"].shape[0] - duration_s * fps) > fps):
        raise SystemExit(
            f"cached corpus at {corpus} does not match the requested "
            f"sizes (found {len(store)} train clips of "
            f"{store[0]['poses'].shape[0]} frames, expected "
            f"{2 * (n_files - 1)} of ~{int(duration_s * fps)}); delete "
            f"it or use a fresh out dir")
    print(f"corpus: {len(store)} train clips, {len(val_store)} val")

    dae_dir = os.path.join(args.out, "dae")
    if sorted(glob.glob(os.path.join(dae_dir, "*.bin"))):
        print("dae: already present, nothing to do")
        return
    dae_cfg = load_config(dict(
        name="dae", model="DAE", hidden_size=rep,
        epochs=(6 if fast else 40), batch_size=512,
        learning_rate=0.002, input_motion_dim=135, random_seed=0,
        model_save_path=dae_dir))
    _, hist = train_dae(
        dae_cfg, all_frames(store),
        all_frames(val_store, store.pose_mean, store.pose_std),
        save_dir=dae_dir, save_every=1000)
    print(f"part a: val MSE {hist['val_loss'][-1]:.5f}")


if __name__ == "__main__":
    main()
