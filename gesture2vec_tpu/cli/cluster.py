"""CLI: build the corpus latent dataset, K-Means clusters, and metrics.

Replaces `python Clustering.py <DAE.ckpt> <VQVAE.ckpt>`
(ref: scripts/Clustering.py:1822-1866): builds the latent dataset,
optionally fits K-Means over sequence latents, and writes Metrics.txt
(Hellinger / Frechet / perplexity / Wasserstein between train and val
token/latent distributions, ref :1353-1628).
"""
from __future__ import annotations

import argparse
import logging
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("rep_checkpoint", help="Part-a checkpoint")
    parser.add_argument("autoencoder_checkpoint", help="Part-b checkpoint")
    parser.add_argument("--store", required=True,
                        help="train clip-store directory")
    parser.add_argument("--val-store", default=None)
    parser.add_argument("--out", default=None,
                        help="output dir (default: <ckpt dir>/clusters)")
    parser.add_argument("--kmeans", type=int, default=0,
                        help="fit K-Means with this many clusters "
                             "(ref uses 300)")
    parser.add_argument("--algo", default="kmeans",
                        choices=["kmeans", "mapdp", "dbscan",
                                 "agglomerative"],
                        help="clustering algorithm for --kmeans > 0 "
                             "(the reference alternates these behind "
                             "flags, ref: Clustering.py:729-755)")
    parser.add_argument("--plots", action="store_true",
                        help="write codebook/latent t-SNE plots")
    parser.add_argument("--export-samples", type=int, default=0,
                        help="write up to N BVH samples per token "
                             "(ref: save_clustered_fast.py)")
    parser.add_argument("--pipeline", default=None,
                        help="fitted data_pipe.json (for BVH exports)")
    parser.add_argument("--platform", default=None)
    from gesture2vec_tpu.utils.jaxcache import add_jax_cache_flag
    add_jax_cache_flag(parser)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(args.jax_cache)

    import numpy as np

    from gesture2vec_tpu.cluster.kmeans import kmeans_fit, save_kmeans
    from gesture2vec_tpu.cluster.latent_dataset import (
        build_latent_dataset, save_latent_dataset)
    from gesture2vec_tpu.cluster.metrics import (frechet_distance,
                                                 hellinger,
                                                 token_histogram,
                                                 token_perplexity,
                                                 wasserstein_distance)
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.train import checkpoints

    logging.basicConfig(level=logging.INFO)
    out = args.out or os.path.join(
        os.path.dirname(args.autoencoder_checkpoint), "clusters")
    os.makedirs(out, exist_ok=True)

    dae_model, dae_vars, dae_payload = \
        checkpoints.load_checkpoint_and_model(args.rep_checkpoint, "DAE")
    seq_model, seq_vars, seq_payload = \
        checkpoints.load_checkpoint_and_model(args.autoencoder_checkpoint,
                                              "autoencoder_vq")
    cfg = seq_payload["config"]
    store = ClipStore(args.store)

    data = build_latent_dataset(store, dae_model=dae_model,
                                dae_variables=dae_vars,
                                seq_model=seq_model,
                                seq_variables=seq_vars,
                                n_poses=cfg.n_poses,
                                stride=cfg.subdivision_stride)
    path = os.path.join(out, "org_latent_clustering_data.npz")
    save_latent_dataset(path, data)
    k = cfg.autoencoder_vq_components
    logging.info("latent dataset: %d windows -> %s", len(data["tokens"]),
                 path)
    logging.info("token perplexity: %.2f (of %d codes)",
                 token_perplexity(data["tokens"], k), k)

    if args.kmeans > 0:
        if args.algo == "kmeans":
            import jax
            res = kmeans_fit(data["seq_latents"], args.kmeans,
                             key=jax.random.PRNGKey(0))
            save_kmeans(os.path.join(out, "kmeans_model.npz"), res)
            logging.info("kmeans(%d) inertia %.2f", args.kmeans,
                         float(res.inertia))
        elif args.algo == "mapdp":
            from gesture2vec_tpu.cluster.mapdp import mapdp_nw
            res = mapdp_nw(data["seq_latents"])
            np.save(os.path.join(out, "mapdp_labels.npy"), res.labels)
            logging.info("mapdp found %d clusters", res.k)
        else:
            from sklearn.cluster import DBSCAN, AgglomerativeClustering
            if args.algo == "dbscan":
                labels = DBSCAN().fit_predict(data["seq_latents"])
            else:
                labels = AgglomerativeClustering(
                    n_clusters=args.kmeans).fit_predict(
                    data["seq_latents"])
            np.save(os.path.join(out, f"{args.algo}_labels.npy"), labels)
            logging.info("%s produced %d labels", args.algo,
                         len(np.unique(labels)))

    if args.plots:
        from gesture2vec_tpu.cluster.plots import (plot_codebook_tsne,
                                                   plot_latent_space)
        cb = np.asarray(seq_vars["params"]["vq_layer"]["codebook"])
        usage = np.bincount(data["tokens"], minlength=cb.shape[0])
        plot_codebook_tsne(cb, os.path.join(out, "codebook_tsne.png"),
                           usage=usage)
        sub = data["seq_latents"][:2000]
        plot_latent_space(sub, os.path.join(out, "latents_tsne.png"),
                          labels=data["tokens"][:2000])
        logging.info("plots written to %s", out)

    if args.export_samples > 0:
        assert args.pipeline, "--pipeline required for --export-samples"
        from gesture2vec_tpu.cluster.latent_dataset import \
            export_cluster_samples
        from gesture2vec_tpu.mocap.features import FeatureExtractor
        fe = FeatureExtractor.load(args.pipeline)
        n = export_cluster_samples(
            data, os.path.join(out, "samples"), fe, store.pose_mean,
            store.pose_std, dae_model, dae_vars,
            max_per_token=args.export_samples)
        logging.info("wrote %d cluster sample BVHs", n)

    if args.val_store:
        val = build_latent_dataset(ClipStore(args.val_store),
                                   dae_model=dae_model,
                                   dae_variables=dae_vars,
                                   seq_model=seq_model,
                                   seq_variables=seq_vars,
                                   n_poses=cfg.n_poses,
                                   stride=cfg.subdivision_stride,
                                   mean=store.pose_mean,
                                   std=store.pose_std)
        lines = [
            f"Hellinger: {hellinger(token_histogram(data['tokens'], k), token_histogram(val['tokens'], k)):.4f}",
            f"Frechet: {frechet_distance(data['seq_latents'], val['seq_latents']):.4f}",
            f"Perplexity(train): {token_perplexity(data['tokens'], k):.2f}",
            f"Perplexity(val): {token_perplexity(val['tokens'], k):.2f}",
            f"Wasserstein: {wasserstein_distance(data['tokens'], val['tokens']):.4f}",
        ]
        with open(os.path.join(out, "Metrics.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        # LaTeX table like the reference emits (ref: Clustering.py:1611-1626)
        vals = [ln.split(": ")[1] for ln in lines]
        with open(os.path.join(out, "Metrics.tex"), "w") as f:
            f.write("\\begin{tabular}{ccccc}\n\\toprule\n"
                    "Hellinger & Fr\\'echet & PPL(train) & PPL(val) & "
                    "Wasserstein \\\\\n\\midrule\n"
                    + " & ".join(vals) + " \\\\\n"
                    "\\bottomrule\n\\end{tabular}\n")
        for ln in lines:
            logging.info(ln)

    # Rep_distance.txt: representation-space smoothness
    # (ref: Clustering.py:410-505 writes the same artifact)
    from gesture2vec_tpu.cluster.metrics import \
        representation_neighbor_distance
    try:
        rep = representation_neighbor_distance(data["seq_latents"])
        with open(os.path.join(out, "Rep_distance.txt"), "w") as f:
            f.write("\n".join(f"{k}: {v:.6f}" for k, v in rep.items())
                    + "\n")
        logging.info("Rep_distance: %s", rep)
    except ValueError as e:   # corpus too small for the +-2 strides
        logging.info("Rep_distance skipped: %s", e)


if __name__ == "__main__":
    main()
