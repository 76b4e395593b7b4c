"""CLI: end-to-end text -> gesture BVH.

Replaces `python inference_text2embedding.py <t2e.ckpt> <transcript>
<DAE.ckpt> <VQVAE.ckpt>` (ref: scripts/inference_text2embedding.py:837+).
"""
from __future__ import annotations

import argparse
import logging
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("t2t_checkpoint")
    parser.add_argument("transcript", nargs="+",
                        help="Google-STT JSON or GENEA TSV; several "
                             "files run as ONE batched device program "
                             "(one output BVH per transcript)")
    parser.add_argument("rep_checkpoint")
    parser.add_argument("autoencoder_checkpoint")
    parser.add_argument("--mesh", default=None,
                        help="shard a multi-transcript batch over a "
                             "device mesh, e.g. 'dp=8'")
    parser.add_argument("--latent-bank", default=None,
                        help="org_latent_clustering_data.npz "
                             "(required for exemplar mode)")
    parser.add_argument("--store", required=True,
                        help="train clip store (for mean/std + vocab)")
    parser.add_argument("--pipeline", required=True,
                        help="fitted data_pipe.json for BVH export")
    parser.add_argument("--mode", choices=["exemplar", "decode"],
                        default="exemplar")
    parser.add_argument("--dataset", choices=["trinity", "twh"],
                        default="trinity",
                        help="skeleton/export variant (ref: "
                             "inference_text2embedding.py DATASET_Type)")
    parser.add_argument("--twh-variant", default="test1")
    parser.add_argument("--out", default="generated.bvh")
    parser.add_argument("--duration", type=float, default=None,
                        help="seconds (default: last word end time)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.0,
                        help="0 = greedy token decode (reference "
                             "behavior); >0 samples tokens at this "
                             "softmax temperature")
    parser.add_argument("--top-k", type=int, default=0,
                        help="truncate sampling to the k best tokens "
                             "(0 = full distribution)")
    parser.add_argument("--stage0-temperature", type=float, default=-1.0,
                        help="multi-stage Part d: override the PRIMARY "
                             "token's temperature only (0 = greedy "
                             "semantic choice while residual stages "
                             "sample at --temperature); -1 = one "
                             "policy for all stages")
    parser.add_argument("--beam-width", type=int, default=0,
                        help="beam-search token decode with this "
                             "many hypotheses (0/1 = greedy; "
                             "exclusive with --temperature)")
    parser.add_argument("--decode-overlap", type=int, default=0,
                        help="decode mode: overlap-blend this many "
                             "frames across chunk boundaries "
                             "(reference-style sliding-window "
                             "blending applied to the token decode)")
    parser.add_argument("--soft-decode", type=float, default=0.0,
                        help="decode mode: rebuild each chunk's "
                             "hidden from the softmax codebook "
                             "mixture at this temperature instead "
                             "of the hard argmax row (0 = reference "
                             "behavior; the GS-Soft decoder is "
                             "trained on soft mixtures)")
    parser.add_argument("--exemplar-continuity",
                        action="store_true",
                        help="exemplar mode: continuity-aware "
                             "retrieval (motion matching) instead "
                             "of the reference's random pick")
    parser.add_argument("--plot-attention", default=None,
                        help="save the first window's attention heatmap "
                             "(ref: inference_text2embedding.py:69-105)")
    parser.add_argument("--platform", default=None)
    from gesture2vec_tpu.utils.jaxcache import add_jax_cache_flag
    add_jax_cache_flag(parser)
    args = parser.parse_args()

    from gesture2vec_tpu.cli._common import (build_generator,
                                             ensure_virtual_devices,
                                             load_bvh_exporter, parse_mesh)
    ensure_virtual_devices(args.mesh, args.platform)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(args.jax_cache)

    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.io.subtitles import read_subtitles

    logging.basicConfig(level=logging.INFO)
    store = ClipStore(args.store)
    gen, cfg = build_generator(args.t2t_checkpoint, args.rep_checkpoint,
                               args.autoencoder_checkpoint, store,
                               mode=args.mode,
                               latent_bank_path=args.latent_bank,
                               seed=args.seed,
                               temperature=args.temperature,
                               top_k=args.top_k,
                               beam_width=args.beam_width,
                               exemplar_continuity=args.exemplar_continuity,
                               decode_overlap=args.decode_overlap,
                               soft_decode=args.soft_decode,
                               stage0_temperature=args.stage0_temperature)
    to_bvh = load_bvh_exporter(args.dataset, args.pipeline,
                               args.twh_variant)

    def _export(frames, out_path):
        to_bvh(frames, path=out_path)
        print(f"wrote {out_path}")

    if len(args.transcript) > 1:
        # batched serving path: all transcripts in ONE device program,
        # optionally sharded over a dp mesh
        import os

        mesh = parse_mesh(args.mesh)
        all_words = [read_subtitles(t) for t in args.transcript]
        durs = [args.duration or (w[-1][2] if w else 6.0)
                for w in all_words]
        t0 = time.time()
        results = gen.generate_batch(all_words, durs, mesh=mesh)
        dt = time.time() - t0
        total = sum(f.shape[0] for f, _ in results)
        logging.info("generated %d transcripts, %d frames in %.2fs "
                     "(%.0f frames/s)", len(results), total, dt,
                     total / dt)
        stem, ext = os.path.splitext(args.out)
        for t_path, (frames, _) in zip(args.transcript, results):
            base = os.path.splitext(os.path.basename(t_path))[0]
            _export(frames, f"{stem}_{base}{ext or '.bvh'}")
        return

    words = read_subtitles(args.transcript[0])
    duration = args.duration or (words[-1][2] if words else 6.0)
    t0 = time.time()
    frames, tokens = gen.generate(words, duration)
    dt = time.time() - t0
    logging.info("generated %d frames (%d tokens) in %.2fs "
                 "(%.0f frames/s)", frames.shape[0], len(tokens), dt,
                 frames.shape[0] / dt)

    if args.plot_attention and gen.t2t_model.use_attention:
        import jax.numpy as jnp
        import numpy as np

        from gesture2vec_tpu.cluster.plots import plot_attention

        t2t_model, t2t_vars, vocab = (gen.t2t_model, gen.t2t_variables,
                                      gen.vocab)
        window_words = [w[0] for w in words][:cfg.extras.get(
            "max_words", 48)]
        ids = np.zeros((1, 48), np.int32)
        wid = vocab.words_to_ids(window_words)[:48]
        ids[0, :len(wid)] = wid
        res = t2t_model.apply(t2t_vars, jnp.asarray(ids),
                              jnp.asarray([max(len(wid), 1)], np.int32),
                              jnp.zeros((1, t2t_model.n_steps), np.int32),
                              train=False)
        attn = np.asarray(res["attentions"])[:, 0, :len(wid)]
        # derive labels from the actual ids: words_to_ids brackets with
        # SOS/EOS, and truncation at 48 can cut EOS off, so rebuilding
        # labels from the word list would mislabel the last column
        labels = [vocab.index2word.get(int(i), "?") for i in wid]
        plot_attention(attn, args.plot_attention, words=labels)
        logging.info("attention heatmap -> %s", args.plot_attention)

    _export(frames, args.out)


if __name__ == "__main__":
    main()
