import numpy as np

from gesture2vec_tpu.cluster.mapdp import mapdp_nw
from gesture2vec_tpu.cluster.metrics import representation_neighbor_distance


def test_rep_neighbor_distance(rng):
    # smooth trajectory: near neighbors much closer than global average
    t = np.linspace(0, 10, 300)
    latents = np.stack([np.sin(t), np.cos(t), 0.5 * t], axis=1)
    m = representation_neighbor_distance(latents)
    assert m["avg_near"] < m["avg_far"]
    assert m["normal_avg_near"] < 1.0
    assert m["avg_dist_total"] > 0


def test_mapdp_separates_blobs(rng):
    centers = np.array([[0, 0], [12, 12], [-12, 12]], float)
    x = np.concatenate([c + rng.normal(0, 0.6, size=(60, 2))
                        for c in centers])
    res = mapdp_nw(x, N0=1.0, max_iter=50)
    assert res.k >= 3
    # each blob should be dominated by a single label
    for i in range(3):
        blob = res.labels[i * 60:(i + 1) * 60]
        counts = np.bincount(blob)
        assert counts.max() / 60 > 0.9
