"""gesture2vec_tpu: a TPU-native framework for co-speech gesture generation.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
pjyazdian/Gesture2Vec (IROS 2022): pose representation learning (DAE),
gesture tokenization (VQ-VAE over GRU seq2seq latents), corpus clustering
and metrics, and text-to-gesture-token translation, chained into a single
jitted text-to-motion inference path.

Layer map (mirrors reference layers L0-L9, see SURVEY.md):
  io/        BVH parse/write, subtitles, audio features   (ref: scripts/pymo, utils/data_utils.py)
  mocap/     vectorized motion pipeline + rotation math    (ref: scripts/pymo/preprocessing.py)
  data/      shard store, windowing, dataset objects       (ref: scripts/data_loader/)
  text/      vocabulary + embeddings                        (ref: scripts/model/vocab.py)
  models/    DAE / VQ / seq-AE / TCN / text2token / GAN     (ref: scripts/model/)
  ops/       Pallas kernels + numeric ops                   (new: TPU-native)
  parallel/  mesh + sharding + collectives                  (new: TPU-native)
  train/     loops, losses, checkpoints, config             (ref: scripts/train_*.py)
  cluster/   kmeans, latent datasets, objective metrics     (ref: scripts/Clustering.py)
  infer/     end-to-end text->gesture, BVH export           (ref: scripts/inference*.py)
"""

__version__ = "0.1.0"
