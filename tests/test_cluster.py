import numpy as np
import jax

from gesture2vec_tpu.cluster.kmeans import (kmeans_fit, kmeans_predict,
                                            load_kmeans, save_kmeans)
from gesture2vec_tpu.cluster.metrics import (corpus_bleu, frechet_distance,
                                             hellinger, sentence_bleu,
                                             token_histogram,
                                             token_perplexity,
                                             wasserstein_distance)


def test_kmeans_separates_blobs(rng):
    centers_true = np.array([[0, 0], [10, 10], [-10, 10]], np.float32)
    x = np.concatenate([
        centers_true[i] + rng.normal(0, 0.5, size=(50, 2))
        for i in range(3)]).astype(np.float32)
    res = kmeans_fit(x, 3, key=jax.random.PRNGKey(0), n_init=4,
                     max_iter=50)
    labels = np.asarray(res.labels)
    # each blob is one pure cluster
    for i in range(3):
        blob = labels[i * 50:(i + 1) * 50]
        assert (blob == blob[0]).all()
    # predict matches fit labels
    pred = np.asarray(kmeans_predict(x, res.centers))
    np.testing.assert_array_equal(pred, labels)


def test_kmeans_save_load(tmp_path, rng):
    x = rng.normal(size=(64, 4)).astype(np.float32)
    res = kmeans_fit(x, 4, key=jax.random.PRNGKey(1), n_init=2,
                     max_iter=20)
    p = str(tmp_path / "kmeans.npz")
    save_kmeans(p, res)
    centers = load_kmeans(p)
    np.testing.assert_allclose(centers, np.asarray(res.centers))


def test_hellinger():
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    assert abs(hellinger(p, q) - 1.0) < 1e-9
    assert hellinger(p, p) < 1e-9


def test_frechet_distance(rng):
    x = rng.normal(size=(500, 8))
    y = rng.normal(size=(500, 8))
    same = frechet_distance(x, x)
    diff = frechet_distance(x, y + 5.0)
    assert abs(same) < 1e-6
    assert diff > 100


def test_token_perplexity():
    uniform = np.arange(8).repeat(20)
    assert abs(token_perplexity(uniform, 8) - 8.0) < 1e-9
    assert abs(token_perplexity(np.zeros(10, np.int32), 8) - 1.0) < 1e-9


def test_bleu():
    ref = [1, 2, 3, 4, 5, 6]
    assert sentence_bleu(ref, ref) > 0.999
    assert sentence_bleu([9, 9, 9, 9, 9, 9], ref) < 0.01
    assert 0 < corpus_bleu([[1, 2, 3, 4, 9, 9]], [ref]) < 1


def test_wasserstein():
    a = np.zeros(100)
    b = np.ones(100)
    assert abs(wasserstein_distance(a, b) - 1.0) < 1e-9
